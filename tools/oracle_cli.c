/* Minimal reference-decoder CLI for golden testing and baseline measurement.
 *
 * Usage: oracle_cli <in.265> <out.yuv|-> [threads] [thread_type] [layer]
 * Decodes a raw annex-B HEVC stream with the reference libOpenHevc wrapper,
 * writes tightly-packed planes (no pitch padding) to out.yuv, and prints
 * "frames=N fps=F" on stderr.  [layer] selects the SHVC output layer
 * (0 = base, 1 = enhancement; default 0).  Built by tools/build_oracle.sh. */

#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <stdint.h>
#include <sys/time.h>

#include "openHevcWrapper.h"

static double now_s(void)
{
    struct timeval tv;
    gettimeofday(&tv, NULL);
    return tv.tv_sec + tv.tv_usec * 1e-6;
}

static uint8_t *buf;
static long buflen;

static void read_file(const char *path)
{
    FILE *f = fopen(path, "rb");
    if (!f) { fprintf(stderr, "cannot open %s\n", path); exit(1); }
    fseek(f, 0, SEEK_END);
    buflen = ftell(f);
    fseek(f, 0, SEEK_SET);
    buf = malloc(buflen + 64);
    if (fread(buf, 1, buflen, f) != (size_t)buflen) exit(1);
    memset(buf + buflen, 0, 64);
    fclose(f);
}

/* next start-code position at or after p (returns buflen if none) */
static long next_sc(long p)
{
    for (; p + 3 <= buflen; p++)
        if (buf[p] == 0 && buf[p + 1] == 0 && buf[p + 2] == 1)
            return p;
    return buflen;
}

static FILE *fout;
static int nframes;

static void write_frame(OpenHevc_Handle h)
{
    OpenHevc_Frame fr;
    memset(&fr, 0, sizeof(fr));
    libOpenHevcGetOutput(h, 1, &fr);
    nframes++;
    if (!fout)
        return;
    int w = fr.frameInfo.nWidth, hh = fr.frameInfo.nHeight;
    int fmt = fr.frameInfo.chromat_format;
    int esz = fr.frameInfo.nBitDepth > 8 ? 2 : 1;
    int cw = fmt == YUV444 ? w : w / 2;
    int ch = fmt == YUV420 ? hh / 2 : hh;
    const uint8_t *y = (const uint8_t *)fr.pvY;
    const uint8_t *u = (const uint8_t *)fr.pvU;
    const uint8_t *v = (const uint8_t *)fr.pvV;
    for (int r = 0; r < hh; r++)
        fwrite(y + (size_t)r * fr.frameInfo.nYPitch, esz, w, fout);
    for (int r = 0; r < ch; r++)
        fwrite(u + (size_t)r * fr.frameInfo.nUPitch, esz, cw, fout);
    for (int r = 0; r < ch; r++)
        fwrite(v + (size_t)r * fr.frameInfo.nVPitch, esz, cw, fout);
}

int main(int argc, char **argv)
{
    if (argc < 3) {
        fprintf(stderr, "usage: %s in.265 out.yuv|- [threads] [thread_type]\n",
                argv[0]);
        return 2;
    }
    int threads = argc > 3 ? atoi(argv[3]) : 1;
    int ttype = argc > 4 ? atoi(argv[4]) : 1;
    int layer = argc > 5 ? atoi(argv[5]) : 0;
    /* argv[6]: enable the decoder's own MD5-SEI verification (verify_md5,
     * hevc.c:4045) — the conformance oracle for formats the wrapper's
     * GetOutput path cannot carry (e.g. 14-bit, no PIX_FMT case) */
    int md5 = argc > 6 ? atoi(argv[6]) : 0;
    read_file(argv[1]);
    if (strcmp(argv[2], "-") != 0) {
        fout = fopen(argv[2], "wb");
        if (!fout) { fprintf(stderr, "cannot open %s\n", argv[2]); return 1; }
    }

    OpenHevc_Handle h = libOpenHevcInit(threads, ttype);
    libOpenHevcSetCheckMD5(h, md5);
    libOpenHevcSetActiveDecoders(h, layer);
    libOpenHevcSetViewLayers(h, layer);
    libOpenHevcStartDecoder(h);

    double t0 = now_s();
    /* split into access units: an AU starts at a VPS/SPS/PPS/AUD/prefix-SEI
     * run or at a VCL NAL with first_slice_segment_in_pic_flag set */
    long au_start = next_sc(0);
    long p = au_start;
    int au_has_vcl = 0;
    while (p < buflen) {
        long sc = p;
        long hdr = sc + 3;
        if (sc > 0 && buf[sc - 1] == 0) { /* 4-byte start code is part of the NAL */ }
        long next = next_sc(hdr);
        int nal_type = (buf[hdr] >> 1) & 0x3f;
        int nuh_layer = ((buf[hdr] & 1) << 5) | (buf[hdr + 1] >> 3);
        int is_vcl = nal_type <= 31;
        int first_slice = is_vcl && hdr + 2 < buflen && (buf[hdr + 2] >> 7);
        /* SHVC: a first-slice VCL NAL of a higher layer continues the AU */
        int au_break = au_has_vcl &&
            ((is_vcl && first_slice && nuh_layer == 0) ||
             ((nal_type == 32 || nal_type == 33 || nal_type == 34 ||
               nal_type == 35 || nal_type == 39) && nuh_layer == 0));
        if (au_break) {
            int got = libOpenHevcDecode(h, buf + au_start, sc - au_start, 0);
            if (got > 0)
                write_frame(h);
            au_start = sc;
            au_has_vcl = 0;
        }
        au_has_vcl |= is_vcl;
        p = next;
    }
    if (au_start < buflen) {
        int got = libOpenHevcDecode(h, buf + au_start, buflen - au_start, 0);
        if (got > 0)
            write_frame(h);
    }
    /* flush */
    for (int i = 0; i < 64; i++) {
        int got = libOpenHevcDecode(h, NULL, 0, 0);
        if (got <= 0)
            break;
        write_frame(h);
    }
    double dt = now_s() - t0;
    fprintf(stderr, "frames=%d fps=%.3f\n", nframes,
            dt > 0 ? nframes / dt : 0.0);
    if (fout)
        fclose(fout);
    libOpenHevcClose(h);
    free(buf);
    return 0;
}
