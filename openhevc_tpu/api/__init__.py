from .openhevc import (OpenHevcDecoder, FrameInfo, OutputFrame,
                       libOpenHevcInit, libOpenHevcStartDecoder,
                       libOpenHevcDecode, libOpenHevcGetPictureInfo,
                       libOpenHevcGetOutput, libOpenHevcGetOutputCpy,
                       libOpenHevcSetCheckMD5, libOpenHevcSetTemporalLayer_id,
                       libOpenHevcSetActiveDecoders, libOpenHevcSetViewLayers,
                       libOpenHevcFlush, libOpenHevcClose, libOpenHevcVersion,
                       libOpenHevcSetDebugMode)
