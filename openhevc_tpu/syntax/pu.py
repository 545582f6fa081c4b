"""Inter prediction-unit syntax (merge/AMVP/MVD). Implemented with the inter
path; stubs raise until then."""


def code_prediction_unit_skip(io, st, cu, x0, y0, cb_size, log2_cb):
    raise NotImplementedError("inter path not implemented yet")


def code_prediction_units(io, st, cu, x0, y0, log2_cb):
    raise NotImplementedError("inter path not implemented yet")
