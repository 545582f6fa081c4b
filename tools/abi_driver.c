/* Minimal player-style driver for the libLibOpenHevcWrapper C ABI shim.
 *
 * Input: a file of length-prefixed access units (uint32 LE size + annex-B
 * bytes), as a container demuxer would deliver them.  Output: raw I420/
 * I422/I444 frames appended to the output file via libOpenHevcGetOutputCpy.
 *
 * Usage: abi_driver <au_file> <out_yuv> [md5]
 */

#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "../openhevc_tpu/native/openhevc_abi.h"

static int write_frame(OpenHevc_Handle h, FILE *out) {
    OpenHevc_FrameInfo info;
    libOpenHevcGetPictureInfo(h, &info);
    int bytes = info.nBitDepth > 8 ? 2 : 1;
    int cs_h = info.chromat_format == YUV420 ? 2 : 1;
    int ch = info.nHeight / cs_h;
    size_t ysz = (size_t)info.nYPitch * info.nHeight * bytes;
    size_t csz = (size_t)info.nUPitch * ch * bytes;
    OpenHevc_Frame_cpy f;
    memset(&f, 0, sizeof(f));
    f.pvY = malloc(ysz);
    f.pvU = malloc(csz);
    f.pvV = malloc(csz);
    f.frameInfo = info;
    int ok = libOpenHevcGetOutputCpy(h, 1, &f);
    if (ok) {
        fwrite(f.pvY, 1, ysz, out);
        fwrite(f.pvU, 1, csz, out);
        fwrite(f.pvV, 1, csz, out);
    }
    free(f.pvY);
    free(f.pvU);
    free(f.pvV);
    return ok;
}

int main(int argc, char **argv) {
    if (argc < 3) {
        fprintf(stderr, "usage: %s <au_file> <out_yuv> [md5]\n", argv[0]);
        return 2;
    }
    FILE *in = fopen(argv[1], "rb");
    FILE *out = fopen(argv[2], "wb");
    if (!in || !out) return 2;

    OpenHevc_Handle h = libOpenHevcInit(1, 1);
    if (argc > 3 && !strcmp(argv[3], "md5"))
        libOpenHevcSetCheckMD5(h, 1);
    libOpenHevcStartDecoder(h);
    printf("%s\n", libOpenHevcVersion(h));

    int frames = 0;
    uint32_t sz;
    unsigned char *buf = NULL;
    size_t cap = 0;
    int64_t pts = 0;
    while (fread(&sz, 4, 1, in) == 1) {
        if (sz > cap) {
            cap = sz;
            buf = (unsigned char *)realloc(buf, cap);
        }
        if (fread(buf, 1, sz, in) != sz) break;
        int got = libOpenHevcDecode(h, buf, (int)sz, pts++);
        if (got < 0) {
            fprintf(stderr, "decode error\n");
            return 1;
        }
        if (got > 0)
            frames += write_frame(h, out);
    }
    // flush the reorder queue
    for (;;) {
        int got = libOpenHevcDecode(h, NULL, 0, pts++);
        if (got <= 0) break;
        frames += write_frame(h, out);
    }
    printf("frames=%d\n", frames);
    libOpenHevcClose(h);
    free(buf);
    fclose(in);
    fclose(out);
    return frames > 0 ? 0 : 1;
}
