/* Mini-GPAC host for the openhevc_dec module: drives the module exactly
 * the way GPAC's codec layer does — QueryInterfaces, LoadInterface,
 * AttachStream with an hvcC-carrying ESD, GetCapabilities for the
 * composition-buffer size, one ProcessData per sample (resizing on
 * GF_BUFFER_TOO_SMALL), the NULL-AU EOS drain, DetachStream and
 * ShutdownInterface.
 *
 * Input file: [u32 LE extradata_len][hvcC] then per sample
 * [u32 LE size][length-prefixed sample].  Output: raw planar frames.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "gf_module_api.h"

extern const u32 *QueryInterfaces(void);
extern GF_BaseInterface *LoadInterface(u32 InterfaceType);
extern void ShutdownInterface(GF_BaseInterface *ifcg);

static u32 rd32(FILE *f, int *eof)
{
    unsigned char b[4];
    if (fread(b, 1, 4, f) != 4) { *eof = 1; return 0; }
    return (u32)b[0] | ((u32)b[1] << 8) | ((u32)b[2] << 16)
           | ((u32)b[3] << 24);
}

int main(int argc, char **argv)
{
    if (argc < 3) {
        fprintf(stderr, "usage: %s in.smp out.yuv\n", argv[0]);
        return 2;
    }
    FILE *in = fopen(argv[1], "rb");
    FILE *out = fopen(argv[2], "wb");
    if (!in || !out) { perror("open"); return 2; }

    const u32 *ifaces = QueryInterfaces();
    int ok = 0;
    for (int i = 0; ifaces[i]; i++)
        if (ifaces[i] == GF_MEDIA_DECODER_INTERFACE) ok = 1;
    if (!ok) { fprintf(stderr, "no media decoder interface\n"); return 1; }
    GF_MediaDecoder *dec =
        (GF_MediaDecoder *)LoadInterface(GF_MEDIA_DECODER_INTERFACE);
    if (!dec) { fprintf(stderr, "LoadInterface failed\n"); return 1; }
    printf("module=%s\n", dec->module_name);

    int eof = 0;
    u32 xlen = rd32(in, &eof);
    u8 *extra = (u8 *)malloc(xlen);
    if (fread(extra, 1, xlen, in) != xlen) return 1;

    GF_ESD esd;
    memset(&esd, 0, sizeof(esd));
    esd.ES_ID = 1;
    esd.objectTypeIndication = GPAC_OTI_VIDEO_HEVC;
    esd.decoderSpecificInfo = extra;
    esd.decoderSpecificInfoSize = xlen;
    if (dec->CanHandleStream((GF_BaseDecoder *)dec, GF_STREAM_VISUAL, &esd,
                             0) != GF_CODEC_SUPPORTED) {
        fprintf(stderr, "CanHandleStream refused\n");
        return 1;
    }
    if (dec->AttachStream((GF_BaseDecoder *)dec, &esd) != GF_OK) {
        fprintf(stderr, "AttachStream failed\n");
        return 1;
    }
    printf("codec=%s\n", dec->GetName((GF_BaseDecoder *)dec));

    u32 cap_bytes = 1u << 22;           /* grows on GF_BUFFER_TOO_SMALL */
    u8 *cb = (u8 *)malloc(cap_bytes);
    int frames = 0;
    u32 cts = 0;
    while (!eof) {
        u32 slen = rd32(in, &eof);
        if (eof) break;
        u8 *sample = (u8 *)malloc(slen);
        if (fread(sample, 1, slen, in) != slen) return 1;
        u32 outlen = cap_bytes;
        GF_Err e = dec->ProcessData(dec, sample, slen, 1, &cts, cb,
                                    &outlen, 0, 0);
        if (e == GF_BUFFER_TOO_SMALL) {
            cap_bytes = outlen;
            cb = (u8 *)realloc(cb, cap_bytes);
            outlen = cap_bytes;
            e = dec->ProcessData(dec, sample, slen, 1, &cts, cb,
                                 &outlen, 0, 0);
        }
        free(sample);
        if (e != GF_OK) { fprintf(stderr, "ProcessData err %d\n", e);
                          return 1; }
        if (outlen) { fwrite(cb, 1, outlen, out); frames++; }
        cts++;
    }
    /* EOS drain: NULL AUs until the module stops producing pictures */
    for (;;) {
        u32 outlen = cap_bytes;
        GF_Err e = dec->ProcessData(dec, NULL, 0, 1, &cts, cb, &outlen,
                                    0, 0);
        if (e != GF_OK || !outlen) break;
        fwrite(cb, 1, outlen, out);
        frames++;
    }
    dec->DetachStream((GF_BaseDecoder *)dec, 1);
    ShutdownInterface((GF_BaseInterface *)dec);
    printf("frames=%d\n", frames);
    fclose(in);
    fclose(out);
    free(cb);
    free(extra);
    return 0;
}
