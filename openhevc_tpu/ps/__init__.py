from .params import (PTL, ShortTermRPS, VPS, SPS, PPS,
                     parse_vps, parse_sps, parse_pps,
                     write_vps, write_sps, write_pps)
