from .bits import BitReader, BitWriter
from .nal import (NalUnit, split_annexb, parse_nal_header, extract_rbsp,
                  escape_rbsp, write_annexb)
