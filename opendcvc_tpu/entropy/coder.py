"""EntropyCoder: paired rANS encoder/decoder with shared CDF registry.

TPU counterpart of the reference wrapper (reference:
src/models/entropy_models.py:11-81).  Symbol conventions:
  * y symbols arrive packed as int16 = (int8 symbol << 8) | uint8 cdf index
    — the packing happens on-device (ops.build_index_enc) so only one
    small int16 plane crosses D2H.
  * z symbols are int8 NHWC-flattened; the per-channel CDF is selected in
    interleaved mode (cdf = i % C + qp * C), avoiding any device-side
    transpose to planar.
"""

import numpy as np

from .rans import RansEncoder, RansDecoder


class EntropyCoder:
    def __init__(self, threaded=None):
        self.encoder = RansEncoder(threaded=threaded)
        self.decoder = RansDecoder(threaded=threaded)

    def add_cdf(self, cdf, cdf_length, offset, build_lut=False):
        enc_idx = self.encoder.add_cdf(cdf, cdf_length, offset,
                                       build_lut=False)
        dec_idx = self.decoder.add_cdf(cdf, cdf_length, offset,
                                       build_lut=build_lut)
        assert enc_idx == dec_idx
        return enc_idx

    def reset(self):
        self.encoder.reset()

    def set_use_two_entropy_coders(self, b):
        self.encoder.set_use_two_encoders(b)
        self.decoder.set_use_two_decoders(b)

    def encode_y(self, packed_symbols, cdf_group_index):
        symbols = np.asarray(packed_symbols)
        assert symbols.dtype == np.int16
        self.encoder.encode_y(symbols, cdf_group_index)

    def encode_z(self, symbols, cdf_group_index, start_offset, channels,
                 idx_base=0):
        self.encoder.encode_z(np.asarray(symbols, dtype=np.int8),
                              cdf_group_index, start_offset, channels,
                              interleaved=True, idx_base=idx_base)

    def flush(self):
        self.encoder.flush()

    def get_encoded_stream(self):
        return self.encoder.get_encoded_stream()

    def set_stream(self, stream):
        self.decoder.set_stream(stream)

    def decode_y(self, indexes, cdf_group_index):
        self.decoder.decode_y(np.asarray(indexes, dtype=np.uint8),
                              cdf_group_index)

    def decode_and_get_y(self, indexes, cdf_group_index):
        self.decode_y(indexes, cdf_group_index)
        return self.get_decoded_tensor()

    def decode_z(self, total_size, cdf_group_index, start_offset, channels,
                 idx_base=0):
        self.decoder.decode_z(total_size, cdf_group_index, start_offset,
                              channels, interleaved=True,
                              idx_base=idx_base)

    def get_decoded_tensor(self):
        return self.decoder.get_decoded_tensor()
