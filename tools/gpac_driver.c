/* GPAC-module-lifecycle driver for the libLibOpenHevcWrapper ABI shim.
 *
 * Replays the exact call sequence of GPAC's openhevc_dec plugin
 * (reference gpac/modules/openhevc_dec/openhevc_dec.c): Init ->
 * SetDebugMode -> SetActiveDecoders/SetViewLayers -> CopyExtraData(hvcC)
 * -> StartDecoder, then per MP4 sample Decode(length-prefixed NALUs) +
 * GetPictureInfo + GetOutputCpy, and at EOS the NULL-decode drain +
 * Flush + Close.  Every symbol the plugin links is exercised, proving the
 * shim is a drop-in library for that player integration.
 *
 * Input file: [u32 LE extradata_len][hvcC bytes] then per sample
 * [u32 LE size][ISO length-prefixed sample bytes].  Output: raw I420
 * frames appended to out_yuv.
 */

#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "../openhevc_tpu/native/openhevc_abi.h"

static int write_frame(OpenHevc_Handle h, FILE *out) {
    OpenHevc_FrameInfo info;
    /* the plugin refreshes stride info before each copy (line 372) */
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
    libOpenHevcGetPictureInfoCpy(h, &f.frameInfo);
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
        fprintf(stderr, "usage: %s <sample_file> <out_yuv>\n", argv[0]);
        return 2;
    }
    FILE *in = fopen(argv[1], "rb");
    FILE *out = fopen(argv[2], "wb");
    if (!in || !out) return 2;

    /* attach_stream (openhevc_dec.c:156-176) */
    OpenHevc_Handle h = libOpenHevcInit(1, 1);
    libOpenHevcSetDebugMode(h, 0);
    libOpenHevcSetActiveDecoders(h, 1);
    libOpenHevcSetViewLayers(h, 0);
    uint32_t xlen;
    if (fread(&xlen, 4, 1, in) != 1) return 2;
    unsigned char *xd = (unsigned char *)malloc(xlen);
    if (fread(xd, 1, xlen, in) != xlen) return 2;
    libOpenHevcCopyExtraData(h, xd, (int)xlen);
    free(xd);
    libOpenHevcStartDecoder(h);
    printf("%s\n", libOpenHevcVersion(h));

    int frames = 0;
    uint32_t sz;
    unsigned char *buf = NULL;
    size_t cap = 0;
    int64_t cts = 0;
    while (fread(&sz, 4, 1, in) == 1) {
        if (sz > cap) {
            cap = sz;
            buf = (unsigned char *)realloc(buf, cap);
        }
        if (fread(buf, 1, sz, in) != sz) break;
        /* ProcessData (openhevc_dec.c:522) */
        int got = libOpenHevcDecode(h, buf, (int)sz, cts++);
        if (got < 0) {
            fprintf(stderr, "decode error\n");
            return 1;
        }
        if (got > 0)
            frames += write_frame(h, out);
    }
    /* EOS drain (openhevc_dec.c:500) then Flush (line 342) */
    for (;;) {
        int got = libOpenHevcDecode(h, NULL, 0, cts++);
        if (got <= 0) break;
        frames += write_frame(h, out);
    }
    libOpenHevcFlush(h);
    libOpenHevcClose(h);
    free(buf);
    fclose(in);
    fclose(out);
    printf("frames=%d\n", frames);
    return frames > 0 ? 0 : 1;
}
