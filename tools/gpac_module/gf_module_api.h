/* Minimal stand-in for the GPAC module SDK headers (<gpac/module.h> +
 * <gpac/modules/codec.h>) — just the subset the openhevc_dec module
 * needs, with the same names, field order and calling conventions, so
 * the module source compiles and runs in-tree without a GPAC checkout.
 * Building against a real GPAC SDK replaces this header with the real
 * ones; the module source itself does not change.
 *
 * Shapes follow GPAC's public module interface (QueryInterfaces /
 * LoadInterface / ShutdownInterface exports; GF_MediaDecoder vtable with
 * AttachStream / DetachStream / GetCapabilities / SetCapabilities /
 * ProcessData), which is what the reference plugin
 * (gpac/modules/openhevc_dec/openhevc_dec.c) implements.
 */
#ifndef GF_MODULE_API_H
#define GF_MODULE_API_H

#include <stdint.h>

typedef uint8_t u8;
typedef uint16_t u16;
typedef uint32_t u32;
typedef uint64_t u64;
typedef int32_t s32;
typedef int Bool;
#define GF_TRUE 1
#define GF_FALSE 0

typedef enum {
    GF_OK = 0,
    GF_BAD_PARAM = -1,
    GF_NOT_SUPPORTED = -2,
    GF_NON_COMPLIANT_BITSTREAM = -3,
    GF_BUFFER_TOO_SMALL = -4,
    GF_PACKED_FRAMES = 2,
} GF_Err;

/* interface registry tags (four-char codes in real GPAC) */
#define GF_MEDIA_DECODER_INTERFACE 0x4D444543u  /* 'MDEC' */

/* every interface starts with these fields (GPAC's GF_DECL_MODULE_INTERFACE) */
#define GF_DECL_MODULE_INTERFACE            \
    u32 InterfaceType;                      \
    const char *module_name;                \
    const char *author_name;                \
    void *HPLUG;

typedef struct {
    GF_DECL_MODULE_INTERFACE
} GF_BaseInterface;

#define GF_REGISTER_MODULE_INTERFACE(ifce, type, name, author) \
    do {                                                       \
        (ifce)->InterfaceType = (type);                        \
        (ifce)->module_name = (name);                          \
        (ifce)->author_name = (author);                        \
    } while (0)

/* elementary-stream descriptor: the decoder-specific config carries the
 * ISO hvcC box payload for HEVC tracks */
typedef struct {
    u16 ES_ID;
    u8 objectTypeIndication;
    u8 *decoderSpecificInfo;
    u32 decoderSpecificInfoSize;
    Bool has_scalable_layers;
} GF_ESD;

/* capability codes (subset of gpac/modules/codec.h) */
enum {
    GF_CODEC_WIDTH = 1,
    GF_CODEC_HEIGHT,
    GF_CODEC_STRIDE,
    GF_CODEC_PIXEL_FORMAT,
    GF_CODEC_OUTPUT_SIZE,
    GF_CODEC_BUFFER_MIN,
    GF_CODEC_BUFFER_MAX,
    GF_CODEC_PADDING_BYTES,
    GF_CODEC_RESILIENT,
    GF_CODEC_CU_DURATION,
    GF_CODEC_PAR,
    GF_CODEC_MEDIA_SWITCH_QUALITY,
};

enum {
    GF_PIXEL_YV12 = 1,          /* 8-bit planar 4:2:0 */
    GF_PIXEL_YV12_10,           /* 10-bit planar 4:2:0 (16-bit samples) */
    GF_PIXEL_YUV422,
    GF_PIXEL_YUV444,
};

typedef struct {
    u32 CapCode;
    union { u32 valueInt; float valueFloat; } cap;
} GF_CodecCapability;

/* base-decoder vtable prefix shared by all decoder interfaces */
#define GF_DECL_BASE_DECODER                                              \
    GF_DECL_MODULE_INTERFACE                                              \
    GF_Err (*AttachStream)(struct _basedecoder *, GF_ESD *esd);           \
    GF_Err (*DetachStream)(struct _basedecoder *, u16 ES_ID);             \
    GF_Err (*GetCapabilities)(struct _basedecoder *,                      \
                              GF_CodecCapability *capability);            \
    GF_Err (*SetCapabilities)(struct _basedecoder *,                      \
                              GF_CodecCapability capability);            \
    u32 (*CanHandleStream)(struct _basedecoder *, u32 StreamType,         \
                           GF_ESD *esd, u8 PL);                           \
    const char *(*GetName)(struct _basedecoder *);                        \
    void *privateStack;

typedef struct _basedecoder {
    GF_DECL_BASE_DECODER
} GF_BaseDecoder;

typedef struct _mediadecoder {
    GF_DECL_BASE_DECODER
    GF_Err (*ProcessData)(struct _mediadecoder *,
                          u8 *inBuffer, u32 inBufferLength,
                          u16 ES_ID, u32 *CTS,
                          u8 *outBuffer, u32 *outBufferLength,
                          u8 PaddingBits, u32 mmlevel);
} GF_MediaDecoder;

/* stream types (gpac/constants.h subset) */
#define GF_STREAM_VISUAL 4
#define GPAC_OTI_VIDEO_HEVC 0x23
#define GPAC_OTI_VIDEO_LHVC 0x24

#define GF_CODEC_SUPPORTED 1
#define GF_CODEC_NOT_SUPPORTED 0

#endif /* GF_MODULE_API_H */
