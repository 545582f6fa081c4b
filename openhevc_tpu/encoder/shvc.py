"""Two-layer SHVC test-stream encoder.

Emits conformant 2-layer scalable streams (spatial x2/x1.5/arbitrary or SNR)
the way SHM does: one VPS with the scalability extension, per-layer SPS/PPS
(the EL SPS in the multilayer form whose geometry lives in the VPS
rep_format), BL slices at nuh_layer_id 0 and EL slices at nuh_layer_id 1
whose RPLs include the upsampled BL picture as the inter-layer reference
(reference decode path: hevc.c:3219-3243, hevc_refs.c:746-752).

The EL encoder reuses the single-layer Encoder machinery: the IL reference
is injected into its DPB under the current POC (the same slot convention the
decoder uses), so MC/merge/AMVP/TMVP treat it like the reference treats the
IL_REF0 long-term entry.
"""

import numpy as np

from .encoder import Encoder, EncoderConfig
from ..ps.params import VPS
from ..ps.layers import make_shvc_vps_ext
from ..bitstream import nal as nalmod
from ..decoder.shvc import make_il_ref


class ShvcEncoder:
    def __init__(self, cfg_bl: EncoderConfig, cfg_el: EncoderConfig):
        assert cfg_bl.bit_depth == cfg_el.bit_depth, \
            "per-layer bit depths must match (reference rep_format limits)"
        self.bl = Encoder(cfg_bl)
        self.el = Encoder(cfg_el, layer_id=1)
        vps = VPS(max_layers=2, max_layer_id=1, num_layer_sets=2,
                  layer_id_included=[[1, 1]])
        vps.ext = make_shvc_vps_ext(cfg_bl.width, cfg_bl.height,
                                    cfg_el.width, cfg_el.height,
                                    bit_depth=cfg_bl.bit_depth)
        self.vps = self.bl.vps = self.el.vps = vps

    def parameter_set_nals(self):
        return self.bl.parameter_set_nals() + self.el.parameter_set_nals()

    def encode_frame(self, src_bl, src_el, slice_type="P", nal_type=None,
                     el_slice_type=None):
        """-> (au_bytes, recon_bl, recon_el).  One access unit: BL slice NALs
        followed by EL slice NALs, each with its MD5 SEI."""
        nal_bl, recon_bl, _ = self.bl.encode_frame(src_bl, slice_type,
                                                   nal_type=nal_type)
        poc = self.bl.poc - 1           # encode_frame advanced it
        el_type = el_slice_type or slice_type
        self.el.poc = poc
        if el_type != "I":
            bl_frame = self.bl.dpb.get(poc)
            il = make_il_ref(bl_frame, self.el.sps,
                             el_is_irap=bool(nal_type is not None and
                                             nalmod.is_irap(nal_type)),
                             nb_list=2 if el_type == "B" else 1,
                             el_dpb=self.el.dpb,
                             phase_align=self.vps.ext.phase_align)
            il.poc = poc
            self.el.dpb.frames[poc] = il
            self.el._il_pocs = (poc,)
        else:
            self.el._il_pocs = ()
        nal_el, recon_el, _ = self.el.encode_frame(src_el, el_type,
                                                   nal_type=nal_type, poc=poc)
        self.el._il_pocs = ()
        return nal_bl + nal_el, recon_bl, recon_el
