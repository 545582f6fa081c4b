/* GPAC media-decoder module over the openhevc_tpu C ABI shim.
 *
 * The TPU-native equivalent of the reference's GPAC plugin
 * (gpac/modules/openhevc_dec/openhevc_dec.c, 645 LoC): same module
 * surface — QueryInterfaces / LoadInterface / ShutdownInterface exports
 * and a GF_MediaDecoder vtable — implemented from scratch against the
 * libLibOpenHevcWrapper ABI (openhevc_tpu/native/openhevc_abi.{h,cc}).
 * AttachStream feeds the track's hvcC box through CopyExtraData (which
 * switches the decoder into ISO length-prefixed NALFF mode), ProcessData
 * decodes one access unit per call and copies the bumped picture into
 * the composition buffer, and the capability getters expose the usual
 * width/height/stride/output-size/pixel-format set GPAC's compositor
 * queries after each reconfiguration.
 *
 * Builds against tools/gpac_module/gf_module_api.h (a minimal in-tree
 * stand-in for the GPAC SDK headers) or, unchanged, against a real GPAC
 * checkout's <gpac/modules/codec.h>.
 */

#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "gf_module_api.h"
#include "../../openhevc_tpu/native/openhevc_abi.h"

typedef struct {
    OpenHevc_Handle codec;
    u16 es_id;
    Bool is_init;
    u32 width, height, stride, out_size;
    u32 pixel_format;
    u32 luma_bpp, chroma_bpp;
    u32 nb_threads;
    Bool pack_mode;
} HEVCDec;

static GF_Err HEVC_ConfigureStream(HEVCDec *ctx, GF_ESD *esd)
{
    /* one decoder instance per attached stream; hvcC extradata rides
     * CopyExtraData, after which the shim expects length-prefixed AUs */
    ctx->codec = libOpenHevcInit((int)ctx->nb_threads, /*frame threads*/ 1);
    if (!ctx->codec) return GF_NON_COMPLIANT_BITSTREAM;
    libOpenHevcSetDebugMode(ctx->codec, 0);
    libOpenHevcSetActiveDecoders(ctx->codec, 0);
    libOpenHevcSetViewLayers(ctx->codec, 0);
    if (esd->decoderSpecificInfo && esd->decoderSpecificInfoSize) {
        libOpenHevcCopyExtraData(ctx->codec, esd->decoderSpecificInfo,
                                 (int)esd->decoderSpecificInfoSize);
    }
    if (!libOpenHevcStartDecoder(ctx->codec)) {
        libOpenHevcClose(ctx->codec);
        ctx->codec = NULL;
        return GF_NON_COMPLIANT_BITSTREAM;
    }
    ctx->is_init = GF_TRUE;
    return GF_OK;
}

static GF_Err HEVC_AttachStream(GF_BaseDecoder *ifcg, GF_ESD *esd)
{
    HEVCDec *ctx = (HEVCDec *)ifcg->privateStack;
    if (ctx->is_init) return GF_NOT_SUPPORTED;   /* one stream per module */
    ctx->es_id = esd->ES_ID;
    if (!ctx->nb_threads) ctx->nb_threads = 1;
    return HEVC_ConfigureStream(ctx, esd);
}

static GF_Err HEVC_DetachStream(GF_BaseDecoder *ifcg, u16 ES_ID)
{
    HEVCDec *ctx = (HEVCDec *)ifcg->privateStack;
    (void)ES_ID;
    if (ctx->codec) {
        libOpenHevcFlush(ctx->codec);
        libOpenHevcClose(ctx->codec);
        ctx->codec = NULL;
    }
    ctx->is_init = GF_FALSE;
    ctx->width = ctx->height = ctx->stride = ctx->out_size = 0;
    return GF_OK;
}

static void HEVC_RefreshInfo(HEVCDec *ctx)
{
    OpenHevc_FrameInfo info;
    libOpenHevcGetPictureInfo(ctx->codec, &info);
    ctx->luma_bpp = info.nBitDepth > 8 ? 2 : 1;
    ctx->chroma_bpp = ctx->luma_bpp;
    ctx->width = (u32)info.nWidth;
    ctx->height = (u32)info.nHeight;
    ctx->stride = (u32)info.nYPitch * ctx->luma_bpp;
    switch (info.chromat_format) {
    case YUV422:
        ctx->pixel_format = GF_PIXEL_YUV422;
        ctx->out_size = ctx->stride * ctx->height * 2;
        break;
    case YUV444:
        ctx->pixel_format = GF_PIXEL_YUV444;
        ctx->out_size = ctx->stride * ctx->height * 3;
        break;
    default:
        ctx->pixel_format = ctx->luma_bpp > 1 ? GF_PIXEL_YV12_10
                                              : GF_PIXEL_YV12;
        ctx->out_size = ctx->stride * ctx->height * 3 / 2;
        break;
    }
}

static GF_Err HEVC_GetCapabilities(GF_BaseDecoder *ifcg,
                                   GF_CodecCapability *capability)
{
    HEVCDec *ctx = (HEVCDec *)ifcg->privateStack;
    switch (capability->CapCode) {
    case GF_CODEC_WIDTH: capability->cap.valueInt = ctx->width; break;
    case GF_CODEC_HEIGHT: capability->cap.valueInt = ctx->height; break;
    case GF_CODEC_STRIDE: capability->cap.valueInt = ctx->stride; break;
    case GF_CODEC_PIXEL_FORMAT:
        capability->cap.valueInt = ctx->pixel_format; break;
    case GF_CODEC_OUTPUT_SIZE:
        capability->cap.valueInt = ctx->out_size; break;
    case GF_CODEC_BUFFER_MIN: capability->cap.valueInt = 1; break;
    case GF_CODEC_BUFFER_MAX: capability->cap.valueInt = 6; break;
    case GF_CODEC_PADDING_BYTES: capability->cap.valueInt = 32; break;
    case GF_CODEC_RESILIENT: capability->cap.valueInt = 1; break;
    case GF_CODEC_CU_DURATION: capability->cap.valueInt = 0; break;
    default:
        capability->cap.valueInt = 0;
        return GF_NOT_SUPPORTED;
    }
    return GF_OK;
}

static GF_Err HEVC_SetCapabilities(GF_BaseDecoder *ifcg,
                                   GF_CodecCapability capability)
{
    HEVCDec *ctx = (HEVCDec *)ifcg->privateStack;
    switch (capability.CapCode) {
    case GF_CODEC_MEDIA_SWITCH_QUALITY:
        /* layer up/down switch: the shim's view-layer selector */
        libOpenHevcSetViewLayers(ctx->codec,
                                 capability.cap.valueInt ? 1 : 0);
        return GF_OK;
    default:
        return GF_NOT_SUPPORTED;
    }
}

static GF_Err HEVC_flush_picture(HEVCDec *ctx, u8 *outBuffer,
                                 u32 *outBufferLength)
{
    OpenHevc_Frame_cpy fr;
    u32 prev = ctx->out_size;
    HEVC_RefreshInfo(ctx);
    if (ctx->out_size != prev && prev != 0) {
        /* resolution/depth change: the compositor must resize its
         * composition buffer before the copy (GPAC's CM_RESIZE path) */
        *outBufferLength = ctx->out_size;
        return GF_BUFFER_TOO_SMALL;
    }
    memset(&fr, 0, sizeof(fr));
    libOpenHevcGetPictureInfoCpy(ctx->codec, &fr.frameInfo);
    {
        u32 cs_h = fr.frameInfo.chromat_format == YUV420 ? 2 : 1;
        u32 cs_w = fr.frameInfo.chromat_format == YUV444 ? 1 : 2;
        size_t ysz = (size_t)fr.frameInfo.nYPitch * ctx->height
                     * ctx->luma_bpp;
        size_t csz = (size_t)fr.frameInfo.nUPitch * (ctx->height / cs_h)
                     * ctx->chroma_bpp;
        (void)cs_w;
        fr.pvY = outBuffer;
        fr.pvU = outBuffer + ysz;
        fr.pvV = outBuffer + ysz + csz;
        if (!libOpenHevcGetOutputCpy(ctx->codec, 1, &fr))
            return GF_NON_COMPLIANT_BITSTREAM;
        *outBufferLength = (u32)(ysz + 2 * csz);
    }
    return GF_OK;
}

static GF_Err HEVC_ProcessData(GF_MediaDecoder *ifcg,
                               u8 *inBuffer, u32 inBufferLength,
                               u16 ES_ID, u32 *CTS,
                               u8 *outBuffer, u32 *outBufferLength,
                               u8 PaddingBits, u32 mmlevel)
{
    HEVCDec *ctx = (HEVCDec *)ifcg->privateStack;
    int got_pic;
    (void)ES_ID; (void)PaddingBits; (void)mmlevel;
    if (!ctx->codec) return GF_BAD_PARAM;
    if (!inBuffer) {
        /* EOS drain: NULL AUs bump the remaining reordered pictures */
        got_pic = libOpenHevcDecode(ctx->codec, NULL, 0,
                                    CTS ? *CTS : 0);
        if (got_pic) return HEVC_flush_picture(ctx, outBuffer,
                                               outBufferLength);
        *outBufferLength = 0;
        return GF_OK;
    }
    got_pic = libOpenHevcDecode(ctx->codec, inBuffer, (int)inBufferLength,
                                CTS ? *CTS : 0);
    if (got_pic < 0) return GF_NON_COMPLIANT_BITSTREAM;
    if (!got_pic) {
        *outBufferLength = 0;
        return GF_OK;
    }
    return HEVC_flush_picture(ctx, outBuffer, outBufferLength);
}

static u32 HEVC_CanHandleStream(GF_BaseDecoder *dec, u32 StreamType,
                                GF_ESD *esd, u8 PL)
{
    (void)dec; (void)PL;
    if (StreamType != GF_STREAM_VISUAL || !esd)
        return GF_CODEC_NOT_SUPPORTED;
    if (esd->objectTypeIndication == GPAC_OTI_VIDEO_HEVC ||
        esd->objectTypeIndication == GPAC_OTI_VIDEO_LHVC)
        return GF_CODEC_SUPPORTED;
    return GF_CODEC_NOT_SUPPORTED;
}

static const char *HEVC_GetCodecName(GF_BaseDecoder *dec)
{
    HEVCDec *ctx = (HEVCDec *)dec->privateStack;
    return ctx->codec ? libOpenHevcVersion(ctx->codec)
                      : "openhevc_tpu";
}

/* ---------------------------------------------------------------- module */

GF_BaseInterface *LoadInterface(u32 InterfaceType)
{
    GF_MediaDecoder *ifcd;
    HEVCDec *dec;
    if (InterfaceType != GF_MEDIA_DECODER_INTERFACE) return NULL;
    ifcd = (GF_MediaDecoder *)calloc(1, sizeof(GF_MediaDecoder));
    dec = (HEVCDec *)calloc(1, sizeof(HEVCDec));
    GF_REGISTER_MODULE_INTERFACE(ifcd, GF_MEDIA_DECODER_INTERFACE,
                                 "openhevc_tpu Decoder", "openhevc_tpu");
    ifcd->privateStack = dec;
    ifcd->AttachStream = HEVC_AttachStream;
    ifcd->DetachStream = HEVC_DetachStream;
    ifcd->GetCapabilities = HEVC_GetCapabilities;
    ifcd->SetCapabilities = HEVC_SetCapabilities;
    ifcd->CanHandleStream = HEVC_CanHandleStream;
    ifcd->GetName = HEVC_GetCodecName;
    ifcd->ProcessData = HEVC_ProcessData;
    return (GF_BaseInterface *)ifcd;
}

void ShutdownInterface(GF_BaseInterface *ifcg)
{
    GF_MediaDecoder *ifcd = (GF_MediaDecoder *)ifcg;
    if (!ifcd) return;
    if (ifcd->privateStack) {
        HEVCDec *ctx = (HEVCDec *)ifcd->privateStack;
        if (ctx->codec) libOpenHevcClose(ctx->codec);
        free(ctx);
    }
    free(ifcd);
}

const u32 *QueryInterfaces(void)
{
    static const u32 si[] = { GF_MEDIA_DECODER_INTERFACE, 0 };
    return si;
}
