"""Lockstep slot packer (ops/pallas_pack) vs the XLA packer — interpret.

Oracle: ops/bitpack.pack_fields with a leading (0, k0) skew field —
the slot column must equal the packed words bit for bit.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from libflate_tpu.ops.bitpack import pack_fields  # noqa: E402
from libflate_tpu.ops.pallas_pack import SLOTS, d_out_for, pack_slots  # noqa: E402


def test_pack_slots_matches_xla_packer(monkeypatch):
    monkeypatch.setenv("LIBFLATE_PALLAS_INTERPRET", "1")
    rng = np.random.default_rng(17)
    F = 32
    fv = np.zeros((SLOTS, F), np.int64)
    fw = np.zeros((SLOTS, F), np.int64)
    # interleaved (f1 <= 17 bits, f2 <= 21 bits) pairs incl. holes
    fw[:, 0::2] = rng.integers(0, 18, (SLOTS, F // 2))
    fw[:, 1::2] = rng.integers(0, 22, (SLOTS, F // 2))
    fw[rng.random((SLOTS, F)) < 0.3] = 0           # hole fields
    fv = rng.integers(0, 1 << 28, (SLOTS, F))
    k0 = rng.integers(0, 32, SLOTS)
    # a couple of degenerate slots
    fw[0] = 0                                       # fully empty chunk
    fw[1] = 1                                       # 32 one-bit fields
    fv[1] = 1
    k0[1] = 31                                      # worst skew

    got = np.asarray(pack_slots(
        jnp.asarray(fv, jnp.int32), jnp.asarray(fw, jnp.int32),
        jnp.asarray(k0, jnp.int32), f_ch=F)).astype(np.uint32)

    d_out = d_out_for(F)
    for s in range(0, SLOTS, 37):
        vals = np.concatenate([[0], fv[s] & ((1 << fw[s]) - 1)])
        wids = np.concatenate([[k0[s]], fw[s]])
        words, bits = pack_fields(jnp.asarray(vals, jnp.int32),
                                  jnp.asarray(wids, jnp.int32))
        words = np.asarray(words).astype(np.uint32)
        nw = (int(bits) + 31) // 32
        assert (got[s][:nw] == words[:nw]).all(), s
        assert (got[s][nw:] == 0).all(), s


def test_stitch_cols_device_matches_host():
    """_stitch_cols_device (scatter-ADD) == stitch_chunk_cols (host OR)
    on disjoint-bit columns, incl. boundary-word overlap and empty
    chunks."""
    from libflate_tpu.ops.pipeline import (_stitch_cols_device,
                                           stitch_chunk_cols)

    rng = np.random.default_rng(31)
    B, n_ch = 5, 9
    # random chunk bit extents incl. zero-width (empty) chunks
    ext = rng.integers(0, 200, (B, n_ch))
    ext[rng.random((B, n_ch)) < 0.25] = 0
    starts = np.zeros((B, n_ch + 1), np.int64)
    starts[:, 1:] = np.cumsum(ext, axis=1)
    bits = starts[:, -1]
    nw = int(((starts[:, :-1] % 32) + ext + 31).max() // 32)
    nw = max(nw, 1)
    # build columns: chunk j holds bits [starts[j], starts[j+1]) of a
    # random per-member bitstream, aligned at starts[j] & 31
    streams = rng.integers(0, 1 << 32, (B, 256), dtype=np.uint64)
    cols = np.zeros((B, n_ch, nw), np.uint32)
    for i in range(B):
        raw = np.unpackbits(
            streams[i].astype(">u8").view(np.uint8), bitorder="little")
        for j in range(n_ch):
            s, e = int(starts[i, j]), int(starts[i, j + 1])
            k0 = s & 31
            for t in range(s, e):
                q, r = divmod(k0 + (t - s), 32)
                cols[i, j, q] |= np.uint32(int(raw[t]) << r)
    ref = stitch_chunk_cols(cols, starts, bits)
    got = np.asarray(_stitch_cols_device(
        jnp.asarray(cols.astype(np.int32)),
        jnp.asarray((starts[:, :n_ch] >> 5).astype(np.int32)),
        w_out=ref.shape[1]))
    assert np.array_equal(got[:, :ref.shape[1]], ref)


def test_stitch_cols_pallas_matches_host(monkeypatch):
    """Pallas roll+OR stitch (ops/pallas_stitch) == host OR oracle,
    interpret mode, incl. boundary overlap / empty chunks / lane wrap."""
    monkeypatch.setenv("LIBFLATE_PALLAS_INTERPRET", "1")
    from libflate_tpu.ops.pallas_stitch import stitch_cols_pallas
    from libflate_tpu.ops.pipeline import stitch_chunk_cols

    rng = np.random.default_rng(77)
    B, n_ch = 4, 13
    ext = rng.integers(0, 3000, (B, n_ch))
    ext[rng.random((B, n_ch)) < 0.25] = 0
    starts = np.zeros((B, n_ch + 1), np.int64)
    starts[:, 1:] = np.cumsum(ext, axis=1)
    bits = starts[:, -1]
    nw = int(((starts[:, :-1] % 32) + ext + 31).max() // 32)
    nw = max(nw, 1)
    streams = rng.integers(0, 1 << 32, (B, 2048), dtype=np.uint64)
    cols = np.zeros((B, n_ch, nw), np.uint32)
    for i in range(B):
        raw = np.unpackbits(
            streams[i].astype(">u8").view(np.uint8), bitorder="little")
        for j in range(n_ch):
            s, e = int(starts[i, j]), int(starts[i, j + 1])
            k0 = s & 31
            for t in range(s, e):
                q, r = divmod(k0 + (t - s), 32)
                cols[i, j, q] |= np.uint32(int(raw[t]) << r)
    ref = stitch_chunk_cols(cols, starts, bits)
    w_out = -(-ref.shape[1] // 128) * 128
    got = np.asarray(stitch_cols_pallas(
        jnp.asarray(cols.astype(np.int32)),
        jnp.asarray((starts[:, :n_ch] >> 5).astype(np.int32)), w_out))
    assert np.array_equal(got[:, :ref.shape[1]], ref)
    assert not got[:, ref.shape[1]:].any()


def test_kernel_pack_stream_byte_identical(monkeypatch):
    """LIBFLATE_PACK_KERNEL=1 must produce the exact bytes of the XLA
    scatter pack through the full pgzf device encoder."""
    monkeypatch.setenv("LIBFLATE_PALLAS_INTERPRET", "1")
    from libflate_tpu.formats import pgzf

    rng = np.random.default_rng(23)
    words = [bytes(rng.integers(97, 123, int(rng.integers(3, 10)),
                                dtype=np.uint8)) for _ in range(200)]
    data = b"\n".join(words[int(i)] for i in
                      rng.zipf(1.4, 60000) % 200)[:150000]
    data += bytes(rng.integers(0, 256, 8192, dtype=np.uint8))

    monkeypatch.setenv("LIBFLATE_PACK_KERNEL", "0")
    ref = pgzf.compress(data, member_size=2048, engine="tpu")
    monkeypatch.setenv("LIBFLATE_PACK_KERNEL", "1")
    got = pgzf.compress(data, member_size=2048, engine="tpu")
    assert got == ref
    assert pgzf.decompress(got, engine="serial") == data
