from .encoder import Encoder, EncoderConfig
