"""Arithmetic coder + .rec container tests.

Round-trip + codelength-vs-entropy (ref rec/io/tests/coding_test.py), plus a
native-vs-pure-Python differential test in the style of ref
test_rejection_sampling.py's fast-vs-naive check.
"""

import os

import numpy as np
import pytest

from rec_tpu.io import ArithmeticCoder, read_rec, write_rec
from rec_tpu.io.arithmetic import _load_native


def _random_message(rs, num_symbols, length):
    msg = np.zeros(length, np.int32)
    msg[:-1] = rs.randint(1, num_symbols, size=length - 1)
    return msg


class TestArithmeticCoder:
    def test_native_available(self):
        assert _load_native() is not None, "C++ arithmetic coder failed to build"

    def test_roundtrip(self):
        rs = np.random.RandomState(0)
        counts = np.ones(65, np.int64)
        counts[1:] += rs.randint(1, 100, size=64)
        ac = ArithmeticCoder(counts)
        msg = _random_message(rs, 65, 2000)
        data, nbits = ac.encode(msg)
        decoded = ac.decode(data, nbits)
        np.testing.assert_array_equal(decoded, msg)

    def test_codelength_near_entropy(self):
        rs = np.random.RandomState(1)
        counts = np.ones(33, np.int64)
        counts[1:] += rs.randint(1, 50, size=32)
        ac = ArithmeticCoder(counts)
        msg = _random_message(rs, 33, 5000)
        _, nbits = ac.encode(msg)
        p = counts / counts.sum()
        entropy_bits = -np.sum(np.log2(p[msg]))
        assert nbits < entropy_bits * 1.02 + 64

    def test_native_matches_python(self):
        """Differential: C++ vs pure-Python implementations bit-identical."""
        rs = np.random.RandomState(2)
        counts = np.ones(17, np.int64)
        counts[1:] += rs.randint(1, 30, size=16)
        msg = _random_message(rs, 17, 300)
        nat = ArithmeticCoder(counts)
        pyc = ArithmeticCoder(counts, force_python=True)
        if not nat.native:
            pytest.skip("native lib unavailable")
        d1, n1 = nat.encode(msg)
        d2, n2 = pyc.encode(msg)
        assert n1 == n2 and d1 == d2
        np.testing.assert_array_equal(pyc.decode(d1, n1), nat.decode(d2, n2))

    def test_skewed_and_tiny(self):
        counts = np.array([1, 1000000, 1], np.int64)
        ac = ArithmeticCoder(counts)
        msg = np.array([1] * 500 + [2, 1, 0], np.int32)
        data, nbits = ac.encode(msg)
        np.testing.assert_array_equal(ac.decode(data, nbits), msg)
        assert nbits < 10 * 8 + 64  # highly compressible

    def test_single_symbol_message(self):
        ac = ArithmeticCoder([5, 5, 5])
        data, nbits = ac.encode(np.array([0], np.int32))
        np.testing.assert_array_equal(ac.decode(data, nbits), [0])


class TestRansCoder:
    """rANS coder (the entropy coder the reference leaves as a TODO,
    ref rec/io/entropy_coding.pyx:304-306)."""

    def test_native_available(self):
        from rec_tpu.io.rans import _load_rans
        assert _load_rans() is not None, "C++ rANS coder failed to build"

    def test_roundtrip(self):
        from rec_tpu.io import RansCoder
        rs = np.random.RandomState(10)
        counts = np.ones(65, np.int64)
        counts[1:] += rs.randint(1, 100, size=64)
        rc = RansCoder(counts)
        msg = _random_message(rs, 65, 2000)
        data = rc.encode(msg)
        np.testing.assert_array_equal(rc.decode(data), msg)

    def test_codelength_near_entropy(self):
        from rec_tpu.io import RansCoder
        rs = np.random.RandomState(11)
        counts = np.ones(33, np.int64)
        counts[1:] += rs.randint(1, 50, size=32)
        rc = RansCoder(counts)
        msg = _random_message(rs, 33, 5000)
        data = rc.encode(msg)
        p = counts / counts.sum()
        entropy_bits = -np.sum(np.log2(p[msg]))
        assert len(data) * 8 < entropy_bits * 1.03 + 64

    def test_native_matches_python(self):
        """Differential: C++ vs pure-Python twins bit-identical, both ways."""
        from rec_tpu.io import RansCoder
        rs = np.random.RandomState(12)
        counts = np.ones(17, np.int64)
        counts[1:] += rs.randint(1, 30, size=16)
        msg = _random_message(rs, 17, 300)
        nat = RansCoder(counts)
        pyc = RansCoder(counts, force_python=True)
        if not nat.native:
            pytest.skip("native lib unavailable")
        d1, d2 = nat.encode(msg), pyc.encode(msg)
        assert d1 == d2
        np.testing.assert_array_equal(pyc.decode(d1), nat.decode(d2))

    def test_normalize_freqs_matches_native(self):
        """The normalized table is part of the format: the Python twin's
        round trip must decode the native encoding even for histograms
        where naive normalization would disagree (many rare symbols)."""
        from rec_tpu.io import RansCoder
        rs = np.random.RandomState(13)
        counts = np.ones(200, np.int64)
        counts[1] = 10_000_000  # heavy skew forces the adjust loop
        counts[2:5] = 0  # absent symbols
        msg = np.array([1] * 50 + [7, 199, 1, 0], np.int32)
        nat = RansCoder(counts, prob_bits=8)
        pyc = RansCoder(counts, prob_bits=8, force_python=True)
        if not nat.native:
            pytest.skip("native lib unavailable")
        assert nat.encode(msg) == pyc.encode(msg)

    def test_skewed_and_tiny(self):
        from rec_tpu.io import RansCoder
        counts = np.array([1, 1000000, 1], np.int64)
        rc = RansCoder(counts)
        msg = np.array([1] * 500 + [2, 1, 0], np.int32)
        data = rc.encode(msg)
        np.testing.assert_array_equal(rc.decode(data), msg)
        assert len(data) < 24  # highly compressible

    def test_single_symbol_message(self):
        from rec_tpu.io import RansCoder
        rc = RansCoder([5, 5, 5])
        data = rc.encode(np.array([0], np.int32))
        np.testing.assert_array_equal(rc.decode(data), [0])

    def test_encode_many_matches_single(self):
        from rec_tpu.io import RansCoder
        rs = np.random.RandomState(14)
        counts_list, messages = [], []
        for i in range(7):
            n = rs.randint(3, 40)
            c = np.ones(n, np.int64)
            c[1:] += rs.randint(1, 60, size=n - 1)
            counts_list.append(c)
            messages.append(_random_message(rs, n, rs.randint(2, 400)))
        many = RansCoder.encode_many(counts_list, messages)
        for c, m, d in zip(counts_list, messages, many):
            assert d == RansCoder(c).encode(m)
            np.testing.assert_array_equal(RansCoder(c).decode(d), m)


class TestRecContainer:
    def test_roundtrip(self, tmp_path):
        rs = np.random.RandomState(3)
        latents = []
        for nb in (4, 7):
            counts = rs.randint(1, 6, size=nb).astype(np.int32)
            indices = np.zeros((nb, 8), np.int32)
            for b in range(nb):
                indices[b, : counts[b]] = rs.randint(0, 20, size=counts[b])
            latents.append((indices, counts))

        path = os.path.join(tmp_path, "test.rec")
        nbytes = write_rec(path, seed=1234, image_shape=(32, 32, 3),
                           block_size=16, max_index=20, latents=latents)
        assert nbytes == os.path.getsize(path)

        seed, shape, block_size, out = read_rec(path, max_partitions=8)
        assert seed == 1234 and shape == (32, 32, 3) and block_size == 16
        assert len(out) == len(latents)
        for (ind, cnt), (ind2, cnt2) in zip(latents, out):
            np.testing.assert_array_equal(cnt, cnt2)
            np.testing.assert_array_equal(ind, ind2)

    def test_roundtrip_rans_codec(self, tmp_path):
        """codec='rans' files round-trip and self-describe (reader needs no
        codec hint); default-codec files stay byte-identical to before."""
        rs = np.random.RandomState(5)
        latents = []
        for nb in (3, 5):
            counts = rs.randint(1, 6, size=nb).astype(np.int32)
            indices = np.zeros((nb, 8), np.int32)
            for b in range(nb):
                indices[b, : counts[b]] = rs.randint(0, 20, size=counts[b])
            latents.append((indices, counts))
        path = os.path.join(tmp_path, "r.rec")
        write_rec(path, seed=55, image_shape=(16, 16, 3), block_size=16,
                  max_index=20, latents=latents, codec="rans")
        seed, shape, block_size, out = read_rec(path, max_partitions=8)
        assert seed == 55
        for (ind, cnt), (ind2, cnt2) in zip(latents, out):
            np.testing.assert_array_equal(cnt, cnt2)
            np.testing.assert_array_equal(ind, ind2)

    def test_compact(self, tmp_path):
        """Container overhead should be small vs the ideal index cost."""
        rs = np.random.RandomState(4)
        nb, P, max_index = 30, 6, 36
        counts = np.full(nb, P, np.int32)
        indices = rs.randint(0, max_index, size=(nb, P)).astype(np.int32)
        path = os.path.join(tmp_path, "c.rec")
        nbytes = write_rec(path, seed=0, image_shape=(8, 8, 3), block_size=32,
                           max_index=max_index, latents=[(indices, counts)])
        ideal_bits = nb * P * np.log2(max_index)
        assert nbytes * 8 < ideal_bits * 1.15 + 500


class TestParallelEncodeMany:
    def test_matches_sequential(self):
        """Thread-fan-out multi-stream encode must be byte-identical to
        per-stream encodes."""
        rs = np.random.RandomState(7)
        counts_list, messages = [], []
        for _ in range(6):
            v = rs.randint(8, 64)
            counts = np.ones(v + 1, np.int64)
            counts[1:] += rs.randint(1, 50, size=v)
            counts_list.append(counts)
            messages.append(_random_message(rs, v + 1, rs.randint(50, 400)))
        par = ArithmeticCoder.encode_many(counts_list, messages)
        for (data, nbits), counts, msg in zip(par, counts_list, messages):
            seq_data, seq_bits = ArithmeticCoder(counts).encode(msg)
            assert nbits == seq_bits and data == seq_data
            np.testing.assert_array_equal(
                ArithmeticCoder(counts).decode(data, nbits), msg)


class TestContainerGolden:
    def test_golden_bytes(self, tmp_path):
        """Pin the on-disk .rec format: fixed input -> fixed bytes.  Catches
        accidental format changes (header layout, endianness, stream packing,
        AC model defaults).  If a change is INTENTIONAL, update the hash and
        document the format break."""
        import hashlib

        rs = np.random.RandomState(11)
        latents = []
        for nb in (3, 5):
            counts = rs.randint(1, 5, size=nb).astype(np.int32)
            indices = np.zeros((nb, 6), np.int32)
            for b in range(nb):
                indices[b, : counts[b]] = rs.randint(0, 20, size=counts[b])
            latents.append((indices, counts))
        path = os.path.join(tmp_path, "g.rec")
        n = write_rec(path, seed=777, image_shape=(16, 16, 3), block_size=32,
                      max_index=20, latents=latents, residual=b"\x01\x02\x03")
        data = open(path, "rb").read()
        assert n == 86
        # little-endian static header: seed, block_size, max_index, H, W, C,
        # custom-nav flag, custom-index flag, num_latents
        assert data[:28].hex() == ("09030000200000001400000010000000"
                                   "100000000300000000000200")
        # Round-5 format break (documented, io/residual.py): the residual
        # section tag moved "R" -> "S" when the payload became the
        # self-describing v2 adaptive-scale format; "R" files are still
        # read (as legacy v1) but never written.
        assert hashlib.sha256(data).hexdigest() == (
            "e03307f5a22afe2626b474e273059a7a0d70c33bb4ac8f1feeb8b3d3f00fd24d")
        assert data[n - 8: n - 7] == b"S"
