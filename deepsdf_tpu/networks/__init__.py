from .decoder import Decoder, DecoderConfig, init_decoder_params  # noqa: F401
