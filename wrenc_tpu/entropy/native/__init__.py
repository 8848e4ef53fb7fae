from .loader import (available, encode_slice_native, encode_slice_wpp_native,
                     greedy_quant_native, trellis_quant_native, wpp_supported)
