/* C ABI surface of libLibOpenHevcWrapper (drop-in for GPAC-style players).
 *
 * Mirrors the frozen interface of the reference wrapper
 * (gpac/modules/openhevc_dec/openHevcWrapper.h:34-98): same type layouts
 * and symbol set, implemented over the openhevc_tpu python package via an
 * embedded CPython interpreter (openhevc_abi.cc).
 */

#ifndef OPENHEVC_TPU_ABI_H
#define OPENHEVC_TPU_ABI_H

#define NV_VERSION "2.0"

#ifdef __cplusplus
extern "C" {
#endif

#include <stdint.h>

typedef void *OpenHevc_Handle;

typedef struct OpenHevc_Rational {
    int num;
    int den;
} OpenHevc_Rational;

enum ChromaFormat { YUV420 = 0, YUV422, YUV444 };

typedef struct OpenHevc_FrameInfo {
    int nYPitch;
    int nUPitch;
    int nVPitch;
    int nBitDepth;
    int nWidth;
    int nHeight;
    int chromat_format;
    OpenHevc_Rational sample_aspect_ratio;
    OpenHevc_Rational frameRate;
    int display_picture_number;
    int flag;
    int64_t nTimeStamp;
} OpenHevc_FrameInfo;

typedef struct OpenHevc_Frame {
    void **pvY;
    void **pvU;
    void **pvV;
    OpenHevc_FrameInfo frameInfo;
} OpenHevc_Frame;

typedef struct OpenHevc_Frame_cpy {
    void *pvY;
    void *pvU;
    void *pvV;
    OpenHevc_FrameInfo frameInfo;
} OpenHevc_Frame_cpy;

OpenHevc_Handle libOpenHevcInit(int nb_pthreads, int thread_type);
int libOpenHevcStartDecoder(OpenHevc_Handle h);
int libOpenHevcDecode(OpenHevc_Handle h, const unsigned char *buff,
                      int nal_len, int64_t pts);
void libOpenHevcGetPictureInfo(OpenHevc_Handle h, OpenHevc_FrameInfo *info);
void libOpenHevcCopyExtraData(OpenHevc_Handle h, unsigned char *extra_data,
                              int extra_size_alloc);
void libOpenHevcGetPictureInfoCpy(OpenHevc_Handle h,
                                  OpenHevc_FrameInfo *info);
int libOpenHevcGetOutput(OpenHevc_Handle h, int got_picture,
                         OpenHevc_Frame *frame);
int libOpenHevcGetOutputCpy(OpenHevc_Handle h, int got_picture,
                            OpenHevc_Frame_cpy *frame);
void libOpenHevcSetCheckMD5(OpenHevc_Handle h, int val);
void libOpenHevcSetDebugMode(OpenHevc_Handle h, int val);
void libOpenHevcSetTemporalLayer_id(OpenHevc_Handle h, int val);
void libOpenHevcSetNoCropping(OpenHevc_Handle h, int val);
void libOpenHevcSetActiveDecoders(OpenHevc_Handle h, int val);
void libOpenHevcSetViewLayers(OpenHevc_Handle h, int val);
void libOpenHevcClose(OpenHevc_Handle h);
void libOpenHevcFlush(OpenHevc_Handle h);
void libOpenHevcFlushSVC(OpenHevc_Handle h, int decoderId);
const char *libOpenHevcVersion(OpenHevc_Handle h);

#ifdef __cplusplus
}
#endif

#endif
