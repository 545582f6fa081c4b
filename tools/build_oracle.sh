#!/bin/bash
# Build the reference openHEVC decoder (/root/reference) into .oracle/:
#   .oracle/oracle_cli     — golden-stream CLI (tools/oracle_cli.c)
#   .oracle/dsp_oracle.so  — per-kernel ctypes shims (tools/dsp_oracle.c)
# Pure-C build (no yasm in this image -> no SIMD; this is the no-asm
# single-thread baseline the benchmarks compare against).
set -e

REF=${REF:-/root/reference}
REPO="$(cd "$(dirname "$0")/.." && pwd)"
OUT="$REPO/.oracle"
BUILD="$OUT/build"
mkdir -p "$BUILD/obj"

# config.h: all SIMD/template knobs off, pthreads on, x86 asm paths off
sed -e 's/@PTHREADS_FOUND@/1/g' \
    -e 's/@GMTIME_R_FOUND@/1/g' -e 's/@LOCALTIME_R_FOUND@/1/g' \
    -e 's/@GETTIMEOFDAY_FOUND@/1/g' -e 's/@STRERROR_R_FOUND@/1/g' \
    -e 's/@SYSCONF_FOUND@/1/g' -e 's/@UNISTD_H_FOUND@/1/g' \
    -e 's/@USLEEP_FOUND@/1/g' \
    -e 's/@[A-Za-z0-9_]*@/0/g' \
    -e 's/#define ARCH_X86 1/#define ARCH_X86 0/' \
    -e 's/#define ARCH_X86_64 1/#define ARCH_X86_64 0/' \
    "$REF/platform/x86/config.h.in" > "$BUILD/config.h"

# Compile from a local copy with ONE deterministic-output fix: the shipped
# per-PU SHVC upsampling path (ACTIVE_PU_UPSAMPLING=1, hevc.h:117) skips
# upsampling CTB row/col 0 when they are only read as MC halo (the
# `ctb_x0 > ctb_size` off-by-ones in ff_upsample_block, hevc_filter.c:1378,
# 1387) and then reads UNINITIALIZED frame memory — verified by memset-
# painting the IL buffer: 27 output pixels of a test stream follow the fill
# value.  The reference's own whole-frame path (ACTIVE_PU_UPSAMPLING=0) is
# deterministic, matches SHM, and produces identical pixels everywhere else,
# so the golden oracle is built with it.
SRCROOT="$BUILD/src"
mkdir -p "$SRCROOT"
for d in libavutil libavcodec libavformat gpac compat; do
    cp -rpu "$REF/$d" "$SRCROOT/"
done
sed -i 's/#define ACTIVE_PU_UPSAMPLING     1/#define ACTIVE_PU_UPSAMPLING     0/' \
    "$SRCROOT/libavcodec/hevc.h"

CFLAGS="-O3 -fPIC -w -std=gnu99 -pthread -I$BUILD -I$SRCROOT -I$SRCROOT/gpac/modules/openhevc_dec -D_GNU_SOURCE -D_ISOC99_SOURCE"

# the library file list from the reference CMakeLists (x86/arm/crypto excluded)
SRC="
libavutil/avstring.c libavutil/atomic.c libavutil/base64.c libavutil/bprint.c
libavutil/buffer.c libavutil/channel_layout.c libavutil/cpu.c libavutil/crc.c
libavutil/des.c libavutil/dict.c libavutil/display.c libavutil/error.c
libavutil/eval.c libavutil/file_open.c libavutil/frame.c libavutil/imgutils.c
libavutil/intmath.c libavutil/log.c libavutil/log2_tab.c
libavutil/mathematics.c libavutil/md5.c libavutil/mem.c libavutil/opt.c
libavutil/parseutils.c libavutil/pixdesc.c libavutil/rational.c
libavutil/random_seed.c libavutil/rc4.c libavutil/samplefmt.c libavutil/sha.c
libavutil/stereo3d.c libavutil/time.c libavutil/timecode.c libavutil/utils.c
gpac/modules/openhevc_dec/openHevcWrapper.c
libavformat/allformats.c libavformat/avio.c libavformat/aviobuf.c
libavformat/cutils.c libavformat/file.c libavformat/flac_picture.c
libavformat/format.c libavformat/id3v1.c libavformat/id3v2.c
libavformat/isom.c libavformat/hevcdec.c libavformat/matroska.c
libavformat/matroskadec.c libavformat/metadata.c libavformat/mov.c
libavformat/mov_chan.c libavformat/mpegts.c libavformat/mux.c
libavformat/oggdec.c libavformat/oggparsecelt.c libavformat/oggparsedirac.c
libavformat/oggparseflac.c libavformat/oggparseogm.c
libavformat/oggparseopus.c libavformat/oggparseskeleton.c
libavformat/oggparsespeex.c libavformat/oggparsetheora.c
libavformat/oggparsevorbis.c libavformat/oggparsevp8.c libavformat/options.c
libavformat/os_support.c libavformat/rawdec.c libavformat/replaygain.c
libavformat/riffdec.c libavformat/riff.c libavformat/rmsipr.c
libavformat/utils.c libavformat/vorbiscomment.c
libavcodec/ac3tab.c libavcodec/allcodecs.c libavcodec/avfft.c
libavcodec/avpacket.c libavcodec/avpicture.c libavcodec/bitstream.c
libavcodec/bitstream_filter.c libavcodec/bswapdsp.c libavcodec/cabac.c
libavcodec/codec_desc.c libavcodec/dct.c libavcodec/dct32_float.c
libavcodec/dct32_template.c libavcodec/dirac.c libavcodec/faanidct.c
libavcodec/fft_template.c libavcodec/flac.c libavcodec/flacdata.c
libavcodec/golomb.c libavcodec/hevc_cabac.c libavcodec/hevc_mvs.c
libavcodec/hevc_parser.c libavcodec/hevc_ps.c libavcodec/hevc_refs.c
libavcodec/hevc_sei.c libavcodec/hevc_filter.c libavcodec/hevc.c
libavcodec/hevcdsp.c libavcodec/hevcpred.c libavcodec/hpeldsp.c
libavcodec/jrevdct.c libavcodec/mathtables.c libavcodec/me_cmp.c
libavcodec/mdct_template.c libavcodec/mpegaudiodata.c libavcodec/mpeg12data.c
libavcodec/mpeg4audio.c libavcodec/imgconvert.c libavcodec/options.c
libavcodec/parser.c libavcodec/pthread_slice.c libavcodec/pthread_frame.c
libavcodec/pthread.c libavcodec/qpeldsp.c libavcodec/raw.c
libavcodec/rawdec.c libavcodec/rdft.c libavcodec/simple_idct.c
libavcodec/utils.c libavcodec/videodsp.c libavcodec/vorbis_parser.c
libavcodec/xiph.c
"

OBJS=""
for f in $SRC; do
    o="$BUILD/obj/$(echo "$f" | tr / _ | sed 's/\.c$/.o/')"
    OBJS="$OBJS $o"
    if [ ! -f "$o" ] || [ "$SRCROOT/$f" -nt "$o" ]; then
        echo "CC $f"
        gcc $CFLAGS -c "$SRCROOT/$f" -o "$o" &
        # bounded parallel compile
        while [ "$(jobs -r | wc -l)" -ge 8 ]; do wait -n; done
    fi
done
wait

echo "LINK liboracle.so"
gcc -shared -o "$BUILD/liboracle.so" $OBJS -lm -lpthread

echo "LINK oracle_cli"
gcc $CFLAGS "$REPO/tools/oracle_cli.c" -o "$OUT/oracle_cli" \
    "$BUILD/liboracle.so" -Wl,-rpath,"$BUILD" -lm -lpthread

echo "LINK dsp_oracle.so"
gcc $CFLAGS -shared "$REPO/tools/dsp_oracle.c" -o "$OUT/dsp_oracle.so" \
    "$BUILD/liboracle.so" -Wl,-rpath,"$BUILD" -lm -lpthread

echo "done: $OUT/oracle_cli, $OUT/dsp_oracle.so"
