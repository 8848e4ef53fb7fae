from .loader import (available, encode_slice_native, trellis_quant_native,
                     greedy_quant_native)
