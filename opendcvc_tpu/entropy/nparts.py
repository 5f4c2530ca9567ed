"""N-part entropy-coder stream split (DC/FM generation).

Mirrors the reference DCVC-DC/FM native coder's `streamPart` mode
(reference DCVC-family/DCVC-DC/src/cpp/py_rans/py_rans.cpp:22-130):
symbols divide across N independent rANS coders — each with its own
worker thread, so coding parallelizes — and the final stream packs as

  flag u8 = ((N-1) << 4) | (1 if per-part sizes fit u16 else 0)
  (N-1) per-part sizes (u16 or u32, little-endian)
  part streams back-to-back

byte-compatible with the reference framing.  With stream_part=1 the
flag byte still leads (flag == 0 | 1), as in the reference.

The per-op symbol split matches the reference exactly: contiguous and
as even as possible (eachSymbolSize = n/N, last part takes the
remainder, py_rans.cpp:26-40).  z-plane parts start mid-channel-cycle,
so each part carries its absolute start offset (`idx_base`) into the
coder and the interleaved per-channel CDF selection keeps the correct
phase — per-part payloads line up with the reference's even split.
"""

import numpy as np

from .coder import EntropyCoder


def _split_sizes(n, parts):
    each = n // parts
    return [each] * (parts - 1) + [n - each * (parts - 1)]


class NPartEntropyCoder:
    """Drop-in EntropyCoder with N-part stream splitting."""

    def __init__(self, stream_part=1, threaded=None):
        assert stream_part >= 1
        self.stream_part = stream_part
        self.parts = [EntropyCoder(threaded=threaded)
                      for _ in range(stream_part)]
        self._dec_pending = []

    # -- shared setup --------------------------------------------------------

    def add_cdf(self, cdf, cdf_length, offset, build_lut=False):
        idx = None
        for p in self.parts:
            idx = p.add_cdf(cdf, cdf_length, offset, build_lut=build_lut)
        return idx

    def reset(self):
        for p in self.parts:
            p.reset()

    def set_use_two_entropy_coders(self, b):
        # the dual-coder packing is the RT generation's mechanism; the
        # DC/FM generation replaces it with the N-part split
        assert not b or self.stream_part == 1

    # -- encode --------------------------------------------------------------

    def encode_y(self, packed_symbols, cdf_group_index):
        symbols = np.asarray(packed_symbols, dtype=np.int16).reshape(-1)
        off = 0
        for p, sz in zip(self.parts,
                         _split_sizes(symbols.size, self.stream_part)):
            p.encode_y(symbols[off:off + sz], cdf_group_index)
            off += sz

    def encode_z(self, symbols, cdf_group_index, start_offset, channels):
        symbols = np.asarray(symbols, dtype=np.int8).reshape(-1)
        off = 0
        for p, sz in zip(self.parts,
                         _split_sizes(symbols.size, self.stream_part)):
            p.encode_z(symbols[off:off + sz], cdf_group_index,
                       start_offset, channels, idx_base=off)
            off += sz

    def flush(self):
        for p in self.parts:
            p.flush()

    def get_encoded_stream(self):
        streams = [p.get_encoded_stream() for p in self.parts]
        max_head = max((len(s) for s in streams[:-1]), default=0)
        per_head = 4 if max_head > 65535 else 2
        flag = ((self.stream_part - 1) << 4) | (1 if per_head == 2 else 0)
        out = [np.uint8(flag).tobytes()]
        for s in streams[:-1]:
            out.append(np.uint16(len(s)).tobytes() if per_head == 2
                       else np.uint32(len(s)).tobytes())
        out.extend(streams)
        return b"".join(out)

    # -- decode --------------------------------------------------------------

    def set_stream(self, stream):
        stream = bytes(stream)
        flag = stream[0]
        n = (flag >> 4) + 1
        assert n == self.stream_part, (n, self.stream_part)
        per_head = 2 if (flag & 1) else 4
        sizes = []
        off = 1
        for _ in range(n - 1):
            sizes.append(int.from_bytes(stream[off:off + per_head],
                                        "little"))
            off += per_head
        for i, p in enumerate(self.parts):
            if i < n - 1:
                p.set_stream(stream[off:off + sizes[i]])
                off += sizes[i]
            else:
                p.set_stream(stream[off:])
        self._dec_pending = []

    def decode_y(self, indexes, cdf_group_index):
        indexes = np.asarray(indexes, dtype=np.uint8).reshape(-1)
        sizes = _split_sizes(indexes.size, self.stream_part)
        off = 0
        for p, sz in zip(self.parts, sizes):
            p.decode_y(indexes[off:off + sz], cdf_group_index)
            off += sz
        self._dec_pending.append(sizes)

    def decode_z(self, total_size, cdf_group_index, start_offset,
                 channels):
        sizes = _split_sizes(total_size, self.stream_part)
        off = 0
        for p, sz in zip(self.parts, sizes):
            p.decode_z(sz, cdf_group_index, start_offset, channels,
                       idx_base=off)
            off += sz
        self._dec_pending.append(sizes)

    def get_decoded_tensor(self):
        self._dec_pending.pop(0)
        return np.concatenate([np.asarray(p.get_decoded_tensor())
                               for p in self.parts])

    def decode_and_get_y(self, indexes, cdf_group_index):
        self.decode_y(indexes, cdf_group_index)
        return self.get_decoded_tensor()
