/* hevc_sdl2-equivalent player over the libLibOpenHevcWrapper C ABI.
 *
 * The reference ships an SDL2 playback path (main_hm/sdl2.c:1-142 display,
 * main_hm/main.c:235-274 decode+present loop, main_hm/SDL_framerate.c pacing).
 * This image has no SDL/X, so the display backend is the terminal itself:
 * frames render as 24-bit-color half-block cells (one char = two pixels
 * stacked, fg color = top, bg = bottom), box-average downscaled to the
 * terminal size.  Everything else mirrors the reference player:
 *
 *   - input is a raw annex-B .265 file; access units are split in C by the
 *     first_slice_segment_in_pic_flag scan (hevc_parser.c:40
 *     hevc_find_frame_end) and fed AU-at-a-time to libOpenHevcDecode
 *   - -r fps paces presentation with a framerate governor
 *     (SDL_framerate.c:84 framerateDelay semantics: sleep until the next
 *     due tick, no catch-up bursts)
 *   - -n disables display, -o dumps raw YUV, -c disables the MD5 check
 *   - exit line matches main_hm/main.c:304-307:
 *       frame= N fps= X time= T video_size= WxH
 *
 * Usage: player -i in.265 [-o out.yuv] [-n] [-c] [-r fps] [-s nframes]
 *               [-z COLSxROWS]
 */

#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <sys/ioctl.h>
#include <sys/time.h>
#include <time.h>
#include <unistd.h>

#include "../openhevc_tpu/native/openhevc_abi.h"

/* ---------------- annex-B access-unit splitter ---------------- */

/* NAL types: VCL is 0..31; a new AU starts at a VCL NAL whose
 * first_slice_segment_in_pic_flag (first bit after the 2-byte header) is
 * set, or at a VPS/SPS/PPS/AUD/prefix-SEI following VCL data
 * (hevc_parser.c:40-87). */
static size_t next_start_code(const uint8_t *p, size_t n, size_t from) {
    for (size_t i = from; i + 3 < n; i++)
        if (p[i] == 0 && p[i + 1] == 0 && p[i + 2] == 1)
            return i;
    return n;
}

/* Return the byte offset where the access unit beginning at `from` ends. */
static size_t au_end(const uint8_t *p, size_t n, size_t from) {
    int saw_vcl = 0;
    size_t i = next_start_code(p, n, from);
    while (i < n) {
        size_t h = i + 3;                     /* NAL header offset */
        if (h + 2 >= n) break;
        int type = (p[h] >> 1) & 0x3F;
        int is_vcl = type <= 31;
        if (saw_vcl) {
            if (is_vcl && (p[h + 2] & 0x80)) return i;  /* first-slice flag */
            if (!is_vcl && (type == 32 || type == 33 || type == 34 ||
                            type == 35 || type == 39))
                return i;                     /* VPS/SPS/PPS/AUD/prefix SEI */
        }
        if (is_vcl) saw_vcl = 1;
        i = next_start_code(p, n, h);
    }
    return n;
}

/* ---------------- terminal display backend ---------------- */

typedef struct {
    int cols, rows;           /* character cells */
    char *buf;                /* ANSI escape scratch */
    size_t cap;
} TermView;

static void term_size(TermView *tv, const char *force) {
    tv->cols = 80;
    tv->rows = 24;
    if (force && sscanf(force, "%dx%d", &tv->cols, &tv->rows) == 2) return;
    struct winsize ws;
    if (ioctl(STDOUT_FILENO, TIOCGWINSZ, &ws) == 0 && ws.ws_col > 0) {
        tv->cols = ws.ws_col;
        tv->rows = ws.ws_row > 1 ? ws.ws_row - 1 : ws.ws_row;
    }
}

static inline uint8_t clamp8(int v) {
    return v < 0 ? 0 : (v > 255 ? 255 : (uint8_t)v);
}

/* BT.601 limited-range YUV -> RGB (what SDL_CreateTexture(IYUV) does). */
static inline void yuv2rgb(int y, int u, int v, uint8_t *rgb) {
    int c = 298 * (y - 16), d = u - 128, e = v - 128;
    rgb[0] = clamp8((c + 409 * e + 128) >> 8);
    rgb[1] = clamp8((c - 100 * d - 208 * e + 128) >> 8);
    rgb[2] = clamp8((c + 516 * d + 128) >> 8);
}

/* Box-average the plane region mapping to cell (cx, cy2) of a W x 2*rows
 * virtual pixel grid. */
static inline int box_avg(const uint8_t *plane, int pw, int ph, int pitch,
                          int bytes, int x0, int x1, int y0, int y1) {
    if (x1 > pw) x1 = pw;
    if (y1 > ph) y1 = ph;
    if (x0 >= x1) x1 = x0 + 1 <= pw ? x0 + 1 : pw;
    if (y0 >= y1) y1 = y0 + 1 <= ph ? y0 + 1 : ph;
    long s = 0;
    int n = 0;
    for (int y = y0; y < y1; y++)
        for (int x = x0; x < x1; x++) {
            const uint8_t *q = plane + (size_t)y * pitch + (size_t)x * bytes;
            s += bytes == 2 ? (q[0] | (q[1] << 8)) : q[0];
            n++;
        }
    return n ? (int)(s / n) : 0;
}

static void term_present(TermView *tv, const OpenHevc_Frame_cpy *f) {
    const OpenHevc_FrameInfo *fi = &f->frameInfo;
    int bytes = fi->nBitDepth > 8 ? 2 : 1;
    int shift = fi->nBitDepth - 8;
    int csx = fi->chromat_format == YUV444 ? 0 : 1;
    int csy = fi->chromat_format == YUV420 ? 1 : 0;
    int W = fi->nWidth, H = fi->nHeight;
    /* fit W x H into cols x 2*rows preserving aspect (cell is ~1:2) */
    int vw = tv->cols, vh = 2 * tv->rows;
    if ((long)W * vh > (long)H * vw) vh = (int)((long)H * vw / W);
    else vw = (int)((long)W * vh / H);
    if (vw < 2) vw = 2;
    if (vh < 2) vh = 2;
    int cols = vw, rows = vh / 2;

    size_t need = (size_t)rows * cols * 48 + rows * 8 + 64;
    if (tv->cap < need) {
        tv->cap = need;
        tv->buf = (char *)realloc(tv->buf, need);
    }
    char *o = tv->buf;
    o += sprintf(o, "\x1b[H");                /* cursor home */
    int pr = -1, pg = -1, pb = -1, pr2 = -1, pg2 = -1, pb2 = -1;
    for (int r = 0; r < rows; r++) {
        for (int c = 0; c < cols; c++) {
            uint8_t rgb[2][3];
            for (int half = 0; half < 2; half++) {
                int py0 = (2 * r + half) * H / vh;
                int py1 = (2 * r + half + 1) * H / vh;
                int px0 = c * W / vw, px1 = (c + 1) * W / vw;
                int y = box_avg((const uint8_t *)f->pvY, W, H,
                                fi->nYPitch * bytes, bytes,
                                px0, px1, py0, py1) >> shift;
                int u = box_avg((const uint8_t *)f->pvU, W >> csx, H >> csy,
                                fi->nUPitch * bytes, bytes, px0 >> csx,
                                (px1 >> csx) + 1, py0 >> csy,
                                (py1 >> csy) + 1) >> shift;
                int v = box_avg((const uint8_t *)f->pvV, W >> csx, H >> csy,
                                fi->nVPitch * bytes, bytes, px0 >> csx,
                                (px1 >> csx) + 1, py0 >> csy,
                                (py1 >> csy) + 1) >> shift;
                yuv2rgb(y, u, v, rgb[half]);
            }
            if (rgb[0][0] != pr || rgb[0][1] != pg || rgb[0][2] != pb) {
                o += sprintf(o, "\x1b[38;2;%d;%d;%dm",
                             rgb[0][0], rgb[0][1], rgb[0][2]);
                pr = rgb[0][0]; pg = rgb[0][1]; pb = rgb[0][2];
            }
            if (rgb[1][0] != pr2 || rgb[1][1] != pg2 || rgb[1][2] != pb2) {
                o += sprintf(o, "\x1b[48;2;%d;%d;%dm",
                             rgb[1][0], rgb[1][1], rgb[1][2]);
                pr2 = rgb[1][0]; pg2 = rgb[1][1]; pb2 = rgb[1][2];
            }
            o += sprintf(o, "\xe2\x96\x80");  /* U+2580 upper half block */
        }
        o += sprintf(o, "\x1b[0m\n");
        pr = pg = pb = pr2 = pg2 = pb2 = -1;
    }
    fwrite(tv->buf, 1, o - tv->buf, stdout);
    fflush(stdout);
}

/* ---------------- framerate governor (SDL_framerate.c analog) --------- */

static double now_s(void) {
    struct timespec ts;
    clock_gettime(CLOCK_MONOTONIC, &ts);
    return ts.tv_sec + ts.tv_nsec * 1e-9;
}

typedef struct {
    double t0, rate;
    long framecount;
} FPSmanager;

static void fps_delay(FPSmanager *m) {          /* SDL_framerate.c:84 */
    if (m->rate <= 0) return;
    m->framecount++;
    double due = m->t0 + m->framecount / m->rate;
    double dt = due - now_s();
    if (dt > 0) {
        struct timespec ts = {(time_t)dt, (long)((dt - (time_t)dt) * 1e9)};
        nanosleep(&ts, NULL);
    } else if (dt < -0.5 / m->rate) {
        m->t0 = now_s() - m->framecount / m->rate;  /* reset baseline */
    }
}

/* ---------------- player ---------------- */

static int present_frame(OpenHevc_Handle h, TermView *tv, FILE *dump,
                         int display, OpenHevc_Frame_cpy *f, size_t *fcap) {
    OpenHevc_FrameInfo info;
    libOpenHevcGetPictureInfo(h, &info);
    int bytes = info.nBitDepth > 8 ? 2 : 1;
    int cs_h = info.chromat_format == YUV420 ? 2 : 1;
    int ch = info.nHeight / cs_h;
    size_t ysz = (size_t)info.nYPitch * info.nHeight * bytes;
    size_t csz = (size_t)info.nUPitch * ch * bytes;
    if (ysz + 2 * csz > *fcap) {
        *fcap = ysz + 2 * csz;
        f->pvY = realloc(f->pvY, ysz);
        f->pvU = realloc(f->pvU, csz);
        f->pvV = realloc(f->pvV, csz);
    }
    f->frameInfo = info;
    if (!libOpenHevcGetOutputCpy(h, 1, f)) return 0;
    if (display) term_present(tv, f);
    if (dump) {
        fwrite(f->pvY, 1, ysz, dump);
        fwrite(f->pvU, 1, csz, dump);
        fwrite(f->pvV, 1, csz, dump);
    }
    return 1;
}

int main(int argc, char **argv) {
    const char *in_path = NULL, *out_path = NULL, *geometry = NULL;
    int display = 1, check_md5 = 1, stop_frames = 0;
    double rate = 0;
    for (int i = 1; i < argc; i++) {
        if (!strcmp(argv[i], "-i") && i + 1 < argc) in_path = argv[++i];
        else if (!strcmp(argv[i], "-o") && i + 1 < argc) out_path = argv[++i];
        else if (!strcmp(argv[i], "-n")) display = 0;
        else if (!strcmp(argv[i], "-c")) check_md5 = 0;
        else if (!strcmp(argv[i], "-r") && i + 1 < argc)
            rate = atof(argv[++i]);
        else if (!strcmp(argv[i], "-s") && i + 1 < argc)
            stop_frames = atoi(argv[++i]);
        else if (!strcmp(argv[i], "-z") && i + 1 < argc)
            geometry = argv[++i];
        else {
            fprintf(stderr, "usage: %s -i in.265 [-o out.yuv] [-n] [-c] "
                    "[-r fps] [-s n] [-z COLSxROWS]\n", argv[0]);
            return 2;
        }
    }
    if (!in_path) { fprintf(stderr, "missing -i\n"); return 2; }

    FILE *fin = fopen(in_path, "rb");
    if (!fin) { perror(in_path); return 2; }
    fseek(fin, 0, SEEK_END);
    long n = ftell(fin);
    fseek(fin, 0, SEEK_SET);
    uint8_t *data = (uint8_t *)malloc(n);
    if (fread(data, 1, n, fin) != (size_t)n) return 2;
    fclose(fin);

    FILE *dump = out_path ? fopen(out_path, "wb") : NULL;
    TermView tv = {0};
    term_size(&tv, geometry);
    FPSmanager gov = {now_s(), rate, 0};

    OpenHevc_Handle h = libOpenHevcInit(1, 1);
    libOpenHevcSetCheckMD5(h, check_md5);
    libOpenHevcStartDecoder(h);

    OpenHevc_Frame_cpy fr;
    memset(&fr, 0, sizeof(fr));
    size_t fcap = 0;
    int frames = 0;
    int64_t pts = 0;
    double t0 = now_s();
    if (display) fputs("\x1b[2J", stdout);    /* clear once */

    size_t pos = next_start_code(data, n, 0);
    while (pos < (size_t)n && !(stop_frames && frames >= stop_frames)) {
        size_t end = au_end(data, n, pos);
        int got = libOpenHevcDecode(h, data + pos, (int)(end - pos), pts++);
        if (got < 0) { fprintf(stderr, "decode error\n"); return 1; }
        if (got > 0 && present_frame(h, &tv, dump, display, &fr, &fcap)) {
            frames++;
            fps_delay(&gov);
        }
        pos = end;
    }
    for (;;) {                                /* drain the reorder queue */
        if (stop_frames && frames >= stop_frames) break;
        int got = libOpenHevcDecode(h, NULL, 0, pts++);
        if (got <= 0) break;
        if (present_frame(h, &tv, dump, display, &fr, &fcap)) {
            frames++;
            fps_delay(&gov);
        }
    }

    double dt = now_s() - t0;
    OpenHevc_FrameInfo info;
    libOpenHevcGetPictureInfo(h, &info);
    /* reference exit line: main_hm/main.c:304-307 */
    fprintf(stderr, "frame= %d fps= %.1f time= %.2f video_size= %dx%d\n",
            frames, frames / dt, dt, info.nWidth, info.nHeight);
    libOpenHevcClose(h);
    if (dump) fclose(dump);
    free(tv.buf);
    free(fr.pvY); free(fr.pvU); free(fr.pvV);
    free(data);
    return frames > 0 ? 0 : 1;
}
