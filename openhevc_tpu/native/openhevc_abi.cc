// libLibOpenHevcWrapper C ABI shim over the openhevc_tpu python package.
//
// A GPAC-style player dlopens this library and drives the frozen
// libOpenHevc* surface (reference openHevcWrapper.c:106-420); each call
// acquires the embedded CPython interpreter and delegates to
// openhevc_tpu.api.openhevc.OpenHevcDecoder.  Output plane pointers stay
// valid until the next GetOutput/Close on the same handle (the shim keeps
// the backing numpy arrays alive on the handle, like the reference keeps
// its AVFrame).
//
// Build: see build_abi() in native/__init__.py (links libpython).

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstring>
#include <cstdio>

#include "openhevc_abi.h"

namespace {

struct Handle {
    PyObject *dec;          // OpenHevcDecoder instance
    PyObject *last_out;     // last OutputFrame (keeps plane memory alive)
    PyObject *np_y, *np_u, *np_v;   // contiguous plane arrays
    void *py, *pu, *pv;     // raw plane pointers (per-handle stable slots)
};

bool g_inited = false;

void ensure_python() {
    if (!Py_IsInitialized()) {
        Py_InitializeEx(0);
        // the embedding thread holds the GIL after init; release it so
        // PyGILState_Ensure works uniformly from any caller thread
        PyEval_SaveThread();
    }
    g_inited = true;
}

PyObject *api_module() {
    static PyObject *mod = nullptr;
    if (!mod) {
        mod = PyImport_ImportModule("openhevc_tpu.api.openhevc");
        if (!mod) PyErr_Print();
    }
    return mod;
}

// fetch an int attribute with a default
long iattr(PyObject *o, const char *name, long dflt) {
    PyObject *a = PyObject_GetAttrString(o, name);
    if (!a) { PyErr_Clear(); return dflt; }
    long v = PyLong_Check(a) ? PyLong_AsLong(a) : dflt;
    Py_DECREF(a);
    return v;
}

void fill_info(PyObject *info, OpenHevc_FrameInfo *out) {
    memset(out, 0, sizeof(*out));
    out->nYPitch = (int)iattr(info, "nYPitch", 0);
    out->nUPitch = (int)iattr(info, "nUPitch", 0);
    out->nVPitch = (int)iattr(info, "nVPitch", 0);
    out->nBitDepth = (int)iattr(info, "nBitDepth", 8);
    out->nWidth = (int)iattr(info, "nWidth", 0);
    out->nHeight = (int)iattr(info, "nHeight", 0);
    out->chromat_format = (int)iattr(info, "chromat_format", 0);
    out->display_picture_number =
        (int)iattr(info, "display_picture_number", 0);
    out->nTimeStamp = iattr(info, "nTimeStamp", 0);
    out->sample_aspect_ratio.num = 0;
    out->sample_aspect_ratio.den = 1;
    out->frameRate.num = 0;
    out->frameRate.den = 1;
}

// pitch in BYTES for an output plane (16-bit samples double the pitch,
// openHevcWrapper.c:255-291)
int byte_pitch(int pitch, int bit_depth) {
    return bit_depth > 8 ? pitch * 2 : pitch;
}

// -> borrowed raw data pointer of a contiguous numpy array (and keeps a
// strong ref in *slot)
void *np_data(PyObject *arr, PyObject **slot) {
    PyObject *iface = PyObject_GetAttrString(arr, "ctypes");
    if (!iface) { PyErr_Print(); return nullptr; }
    PyObject *dataptr = PyObject_GetAttrString(iface, "data");
    Py_DECREF(iface);
    if (!dataptr) { PyErr_Print(); return nullptr; }
    void *p = (void *)PyLong_AsUnsignedLongLong(dataptr);
    Py_DECREF(dataptr);
    Py_XDECREF(*slot);
    *slot = arr;            // steal the caller's reference
    return p;
}

}  // namespace

extern "C" {

OpenHevc_Handle libOpenHevcInit(int nb_pthreads, int thread_type) {
    ensure_python();
    PyGILState_STATE g = PyGILState_Ensure();
    Handle *h = new Handle();
    memset(h, 0, sizeof(*h));
    PyObject *mod = api_module();
    if (mod) {
        PyObject *cls = PyObject_GetAttrString(mod, "OpenHevcDecoder");
        if (cls) {
            h->dec = PyObject_CallFunction(cls, "ii", nb_pthreads,
                                           thread_type);
            if (!h->dec) PyErr_Print();
            Py_DECREF(cls);
        }
    }
    PyGILState_Release(g);
    return (OpenHevc_Handle)h;
}

int libOpenHevcStartDecoder(OpenHevc_Handle vh) {
    Handle *h = (Handle *)vh;
    if (!h || !h->dec) return -1;
    PyGILState_STATE g = PyGILState_Ensure();
    PyObject *r = PyObject_CallMethod(h->dec, "start", nullptr);
    if (!r) PyErr_Print();
    Py_XDECREF(r);
    PyGILState_Release(g);
    return 1;
}

int libOpenHevcDecode(OpenHevc_Handle vh, const unsigned char *buff,
                      int nal_len, int64_t pts) {
    Handle *h = (Handle *)vh;
    if (!h || !h->dec) return -1;
    PyGILState_STATE g = PyGILState_Ensure();
    PyObject *r = PyObject_CallMethod(h->dec, "decode", "y#L",
                                      (const char *)buff,
                                      (Py_ssize_t)nal_len, (long long)pts);
    int got = -1;
    if (r) {
        got = (int)PyLong_AsLong(r);
        Py_DECREF(r);
    } else PyErr_Print();
    PyGILState_Release(g);
    return got;
}

void libOpenHevcCopyExtraData(OpenHevc_Handle vh, unsigned char *extra_data,
                              int extra_size_alloc) {
    Handle *h = (Handle *)vh;
    if (!h || !h->dec) return;
    PyGILState_STATE g = PyGILState_Ensure();
    PyObject *r = PyObject_CallMethod(h->dec, "copy_extradata", "y#",
                                      (const char *)extra_data,
                                      (Py_ssize_t)extra_size_alloc);
    if (!r) PyErr_Print();
    Py_XDECREF(r);
    PyGILState_Release(g);
}

void libOpenHevcGetPictureInfo(OpenHevc_Handle vh,
                               OpenHevc_FrameInfo *info) {
    Handle *h = (Handle *)vh;
    if (!h || !h->dec || !info) return;
    PyGILState_STATE g = PyGILState_Ensure();
    PyObject *r = PyObject_CallMethod(h->dec, "get_picture_info", nullptr);
    if (r) {
        fill_info(r, info);
        Py_DECREF(r);
    } else PyErr_Print();
    PyGILState_Release(g);
}

void libOpenHevcGetPictureInfoCpy(OpenHevc_Handle vh,
                                  OpenHevc_FrameInfo *info) {
    libOpenHevcGetPictureInfo(vh, info);
}

static int get_output_common(Handle *h, int got_picture,
                             OpenHevc_FrameInfo *info) {
    if (!got_picture) return 1;
    PyObject *r = PyObject_CallMethod(h->dec, "get_output", nullptr);
    if (!r || r == Py_None) {
        Py_XDECREF(r);
        return 0;
    }
    Py_XDECREF(h->last_out);
    h->last_out = r;
    PyObject *fi = PyObject_GetAttrString(r, "frameInfo");
    if (fi) {
        fill_info(fi, info);
        Py_DECREF(fi);
    }
    // numpy views from cropping may be non-contiguous: materialize
    const char *names[3] = {"pvY", "pvU", "pvV"};
    PyObject **slots[3] = {&h->np_y, &h->np_u, &h->np_v};
    void **ptrs[3] = {&h->py, &h->pu, &h->pv};
    for (int i = 0; i < 3; i++) {
        PyObject *pl = PyObject_GetAttrString(r, names[i]);
        if (!pl) { PyErr_Print(); return 0; }
        PyObject *cont = PyObject_CallMethod(pl, "copy", nullptr);
        Py_DECREF(pl);
        if (!cont) { PyErr_Print(); return 0; }
        *ptrs[i] = np_data(cont, slots[i]);
    }
    return 1;
}

int libOpenHevcGetOutput(OpenHevc_Handle vh, int got_picture,
                         OpenHevc_Frame *frame) {
    Handle *h = (Handle *)vh;
    if (!h || !h->dec || !frame) return 0;
    PyGILState_STATE g = PyGILState_Ensure();
    int ok = get_output_common(h, got_picture, &frame->frameInfo);
    if (ok && got_picture) {
        // like the reference, the pv fields receive the plane data
        // pointers directly (openHevcWrapper.c:344-346)
        frame->pvY = (void **)h->py;
        frame->pvU = (void **)h->pu;
        frame->pvV = (void **)h->pv;
    }
    PyGILState_Release(g);
    return ok;
}

int libOpenHevcGetOutputCpy(OpenHevc_Handle vh, int got_picture,
                            OpenHevc_Frame_cpy *frame) {
    Handle *h = (Handle *)vh;
    if (!h || !h->dec || !frame) return 0;
    PyGILState_STATE g = PyGILState_Ensure();
    int ok = get_output_common(h, got_picture, &frame->frameInfo);
    if (ok && got_picture && frame->pvY) {
        OpenHevc_FrameInfo *fi = &frame->frameInfo;
        int cs_h = fi->chromat_format == YUV420 ? 2 : 1;
        int yp = byte_pitch(fi->nYPitch, fi->nBitDepth);
        int up = byte_pitch(fi->nUPitch, fi->nBitDepth);
        memcpy(frame->pvY, h->py, (size_t)yp * fi->nHeight);
        memcpy(frame->pvU, h->pu, (size_t)up * (fi->nHeight / cs_h));
        memcpy(frame->pvV, h->pv, (size_t)up * (fi->nHeight / cs_h));
    }
    PyGILState_Release(g);
    return ok;
}

void libOpenHevcSetCheckMD5(OpenHevc_Handle vh, int val) {
    Handle *h = (Handle *)vh;
    if (!h || !h->dec) return;
    PyGILState_STATE g = PyGILState_Ensure();
    PyObject *r = PyObject_CallMethod(h->dec, "set_check_md5", "i", val);
    Py_XDECREF(r);
    PyGILState_Release(g);
}

void libOpenHevcSetDebugMode(OpenHevc_Handle vh, int val) {
    Handle *h = (Handle *)vh;
    if (!h || !h->dec) return;
    PyGILState_STATE g = PyGILState_Ensure();
    PyObject *r = PyObject_CallMethod(h->dec, "set_debug_mode", "i", val);
    if (!r) PyErr_Clear();
    Py_XDECREF(r);
    PyGILState_Release(g);
}

void libOpenHevcSetTemporalLayer_id(OpenHevc_Handle vh, int val) {
    Handle *h = (Handle *)vh;
    if (!h || !h->dec) return;
    PyGILState_STATE g = PyGILState_Ensure();
    PyObject *r = PyObject_CallMethod(h->dec, "set_temporal_layer_id", "i",
                                      val);
    Py_XDECREF(r);
    PyGILState_Release(g);
}

void libOpenHevcSetNoCropping(OpenHevc_Handle vh, int val) {
    Handle *h = (Handle *)vh;
    if (!h || !h->dec) return;
    PyGILState_STATE g = PyGILState_Ensure();
    PyObject *r = PyObject_CallMethod(h->dec, "set_no_cropping", "i", val);
    if (!r) PyErr_Clear();
    Py_XDECREF(r);
    PyGILState_Release(g);
}

void libOpenHevcSetActiveDecoders(OpenHevc_Handle vh, int val) {
    Handle *h = (Handle *)vh;
    if (!h || !h->dec) return;
    PyGILState_STATE g = PyGILState_Ensure();
    PyObject *r = PyObject_CallMethod(h->dec, "set_active_decoders", "i",
                                      val);
    Py_XDECREF(r);
    PyGILState_Release(g);
}

void libOpenHevcSetViewLayers(OpenHevc_Handle vh, int val) {
    Handle *h = (Handle *)vh;
    if (!h || !h->dec) return;
    PyGILState_STATE g = PyGILState_Ensure();
    PyObject *r = PyObject_CallMethod(h->dec, "set_view_layers", "i", val);
    Py_XDECREF(r);
    PyGILState_Release(g);
}

void libOpenHevcFlush(OpenHevc_Handle vh) {
    Handle *h = (Handle *)vh;
    if (!h || !h->dec) return;
    PyGILState_STATE g = PyGILState_Ensure();
    PyObject *r = PyObject_CallMethod(h->dec, "flush", nullptr);
    Py_XDECREF(r);
    PyGILState_Release(g);
}

void libOpenHevcFlushSVC(OpenHevc_Handle vh, int decoderId) {
    (void)decoderId;
    libOpenHevcFlush(vh);
}

void libOpenHevcClose(OpenHevc_Handle vh) {
    Handle *h = (Handle *)vh;
    if (!h) return;
    PyGILState_STATE g = PyGILState_Ensure();
    if (h->dec) {
        PyObject *r = PyObject_CallMethod(h->dec, "close", nullptr);
        Py_XDECREF(r);
    }
    Py_XDECREF(h->last_out);
    Py_XDECREF(h->np_y);
    Py_XDECREF(h->np_u);
    Py_XDECREF(h->np_v);
    Py_XDECREF(h->dec);
    PyGILState_Release(g);
    delete h;
}

const char *libOpenHevcVersion(OpenHevc_Handle vh) {
    (void)vh;
    return "OpenHEVC v" NV_VERSION " (openhevc_tpu)";
}

}  // extern "C"
