"""Sync-indexed PGZF mode: LS subfield + zero-speculation Pallas decode.

Kernel semantics are pinned on CPU via pallas interpret mode; the
compiled path is exercised on TPU by bench.py / standalone scripts.
"""
import gzip as stdgzip
import struct

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from libflate_tpu.formats import pgzf


@pytest.fixture()
def sync_interpret(monkeypatch):
    monkeypatch.setenv("LIBFLATE_PALLAS_INTERPRET", "1")
    yield


def _corpus(n, seed=7):
    rng = np.random.default_rng(seed)
    words = [bytes(rng.integers(97, 123, rng.integers(3, 10),
                                dtype=np.uint8)) for _ in range(400)]
    return b"\n".join(words[int(i)] for i in
                      rng.zipf(1.4, n // 3) % 400)[:n]


class TestSyncKernel:
    def test_tokens_match_tokenizer(self, sync_interpret):
        """Kernel tokens == the device tokenizer's, chunk by chunk."""
        from libflate_tpu.ops import pallas_sync_decode as psd
        from libflate_tpu.ops.deflate_encode import splice_blocks_host
        from libflate_tpu.ops.huffman import decode_table
        from libflate_tpu.ops.pipeline import (_encode_batch_sync,
                                               _shared_stats,
                                               _tokenize_batch)
        K = 32
        B = 4
        member = 2048
        data = _corpus(B * member)
        blocks = np.zeros((B, member), np.uint8)
        n_valid = np.zeros((B,), np.int32)
        for i in range(B):
            chunk = data[i * member:(i + 1) * member]
            blocks[i, :len(chunk)] = np.frombuffer(chunk, np.uint8)
            n_valid[i] = len(chunk)
        bfinal = np.ones((B,), np.int32)

        words, bits, cnt, offs, _ovf = map(np.asarray, _encode_batch_sync(
            jnp.asarray(blocks), jnp.asarray(n_valid),
            jnp.asarray(bfinal), K))
        a, b, _ = map(np.asarray, _tokenize_batch(
            jnp.asarray(blocks), jnp.asarray(n_valid)))
        valid = (np.arange(a.shape[1], dtype=np.int32)[None, :]
                 < cnt[:, None])
        # must match _encode_batch_sync's table build (SHARED_MAX_LEN);
        # a 12-bit root over <=10-bit codes also covers the default-
        # root_bits decode path
        lit_l, dist_l, *_r = _shared_stats(
            jnp.asarray(a), jnp.asarray(b), jnp.asarray(valid))
        lit_t = decode_table(jnp.asarray(lit_l), 12)
        dist_t = decode_table(jnp.asarray(dist_l), 8)

        all_offs, all_ext, all_cnt, spans = [], [], [], []
        blob = bytearray()
        for i in range(B):
            body = splice_blocks_host(words[i:i + 1], bits[i:i + 1])
            base = len(blob) * 8
            blob += body
            nc = -(-int(cnt[i]) // K)
            for j in range(nc):
                start = int(offs[i, j])
                end = (int(offs[i, j + 1]) if (j + 1) * K <= int(cnt[i])
                       else int(bits[i]))
                all_offs.append(base + start)
                all_ext.append(end - start)
                all_cnt.append(min(K, int(cnt[i]) - j * K))
            spans.append((i, nc))

        need = int(max(e + (o & 31) for o, e in
                       zip(all_offs, all_ext)) + 64 + 31) // 32 + 1
        d = max(8, -(-need // 4) * 4)
        staged, sb = psd.stage_chunks(bytes(blob),
                                      np.asarray(all_offs, np.int64),
                                      np.asarray(all_ext, np.int64), d)
        counts = np.zeros(staged.shape[0] * psd.SLOTS, np.int32)
        counts[:len(all_cnt)] = all_cnt
        counts = counts.reshape(staged.shape[0], psd.SUBLANES, psd.LANES)
        out = np.asarray(psd.sync_decode(
            jnp.asarray(staged), jnp.asarray(sb), jnp.asarray(counts),
            lit_t.astype(jnp.int32), dist_t.astype(jnp.int32), d_k := K))
        toks = psd.gather_tokens(out, len(all_offs), K)

        s = 0
        for i, nc in spans:
            flat = toks[s:s + nc].reshape(-1)[:int(cnt[i])]
            np.testing.assert_array_equal(flat & 511, a[i, :int(cnt[i])])
            np.testing.assert_array_equal(flat >> 9, b[i, :int(cnt[i])])
            s += nc


class TestSyncContainer:
    def test_roundtrip_and_stock_gzip(self, sync_interpret):
        data = _corpus(200000) + bytes(
            np.random.default_rng(1).integers(0, 256, 40000,
                                              dtype=np.uint8))
        stream = pgzf.compress(data, member_size=32768, engine="tpu")
        # 100% stock-gzip readable (LS rides the standard FEXTRA)
        assert stdgzip.decompress(stream) == data
        # sync path decodes
        refs = pgzf.index_members(stream)
        assert pgzf._decompress_sync_device(stream, refs, True) == data
        # dispatcher routes to it
        assert pgzf.decompress(stream, engine="tpu") == data
        # other engines also decode it
        assert pgzf.decompress(stream, engine="native") == data

    @pytest.mark.parametrize("member_size", [3072, 24576])
    def test_non_pow2_member_size_crc(self, sync_interpret, member_size):
        """Round-2 ADVICE regression: crc32_f_rows with a member size
        whose 64-byte chunk count is not a power of two wrote corrupt
        gzip CRC32 fields on the tpu engine."""
        data = _corpus(member_size * 3 + 1234)
        stream = pgzf.compress(data, member_size=member_size, engine="tpu")
        assert stdgzip.decompress(stream) == data          # CRCs verify
        assert pgzf.decompress(stream, verify=True) == data

    def test_ls_subfield_parse(self, sync_interpret):
        data = _corpus(100000)
        stream = pgzf.compress(data, member_size=32768, engine="tpu")
        from libflate_tpu.formats import gzip as fgzip
        hdr, _ = fgzip.Header.decode(stream, 0)
        info = pgzf._parse_sync(hdr)
        assert info is not None
        k, n_tokens, first_bit, n_chunks, deltas = info
        assert k == 256 and n_tokens > 0
        assert n_chunks == -(-n_tokens // k)
        assert len(deltas) == n_chunks - 1
        assert (np.asarray(deltas) > 0).all()

    def test_corrupt_sync_index_falls_back_or_raises(self, sync_interpret):
        data = _corpus(100000)
        stream = bytearray(pgzf.compress(data, member_size=32768,
                                         engine="tpu"))
        # flip a delta byte inside the first LS subfield: CRC must catch
        from libflate_tpu.formats import gzip as fgzip
        hdr, body = fgzip.Header.decode(bytes(stream), 0)
        # LS payload sits right before body: locate by id scan
        ls_pos = bytes(stream).find(b"LS", 0, body)
        assert ls_pos > 0
        stream[ls_pos + 2 + 2 + 14] ^= 0x40
        refs = pgzf.index_members(bytes(stream))
        with pytest.raises(Exception):
            out = pgzf._decompress_sync_device(bytes(stream), refs, True)
            assert out != data  # pragma: no cover - must raise above

    def test_native_stream_without_ls_falls_back(self, sync_interpret):
        native = pytest.importorskip("libflate_tpu.native")
        if not native.available():
            pytest.skip("native engine unavailable")
        data = _corpus(100000)
        stream = pgzf.compress(data, member_size=32768, engine="native")
        refs = pgzf.index_members(stream)
        with pytest.raises(ImportError):
            pgzf._decompress_sync_device(stream, refs, True)
        assert pgzf.decompress(stream, engine="tpu") == data


class TestKernelDebugChecks:
    def test_poison_on_corrupt_index(self, sync_interpret, monkeypatch):
        """SURVEY §5 debug_assert parity: with LIBFLATE_DEBUG_CHECKS the
        kernel tags slots whose cursor escapes the staged window and the
        host raises a typed error instead of relying on CRC."""
        monkeypatch.setenv("LIBFLATE_DEBUG_CHECKS", "1")
        data = _corpus(120000)
        stream = bytearray(pgzf.compress(data, member_size=32768,
                                         engine="tpu"))
        # clean stream still decodes with checks on
        refs = pgzf.index_members(bytes(stream))
        assert pgzf._decompress_sync_device(bytes(stream), refs, True) \
            == data
        # corrupt a mid-stream LS delta so a chunk starts far off
        ls = bytes(stream).find(b"LS")
        assert ls > 0
        stream[ls + 4 + 15] ^= 0xFF
        refs = pgzf.index_members(bytes(stream))
        with pytest.raises(Exception):
            pgzf._decompress_sync_device(bytes(stream), refs, True)


class TestDecompressToDevice:
    def test_plaintext_stays_on_device(self, sync_interpret):
        """decompress_to_device: sync kernel -> device token reorder ->
        on-device LZ77 expansion; plaintext rows verified against the
        source without any engine-level D2H in between."""
        import jax.numpy as jnp
        data = _corpus(150000)
        stream = pgzf.compress(data, member_size=32768, engine="tpu")
        out, lengths = pgzf.decompress_to_device(stream, verify=True)
        assert isinstance(out, jnp.ndarray) and out.dtype == jnp.uint8
        pieces = []
        out_np = np.asarray(out)
        for i, ln in enumerate(np.asarray(lengths)):
            pieces.append(out_np[i, :int(ln)].tobytes())
        assert b"".join(pieces) == data

    def test_non_indexed_stream_takes_foreign_bridge(self,
                                                     sync_interpret):
        # round 5: streams without the LS sync index no longer reject —
        # they fall through to the foreign C-token bridge
        # (pgzf._foreign_to_device) and still land device-resident
        native = pytest.importorskip("libflate_tpu.native")
        if not native.available():
            pytest.skip("native engine unavailable")
        data = _corpus(80000)
        stream = pgzf.compress(data, member_size=32768, engine="native")
        out, lengths = pgzf.decompress_to_device(stream, verify=True)
        out_np = np.asarray(out)
        pieces = [out_np[i, :int(ln)].tobytes()
                  for i, ln in enumerate(np.asarray(lengths))]
        assert b"".join(pieces) == data


@pytest.mark.parametrize("seed", range(4))
def test_sync_container_content_fuzz(sync_interpret, seed):
    """Randomized payload mixes through device encode -> every decoder."""
    rng = np.random.default_rng(100 + seed)
    parts = []
    for _ in range(int(rng.integers(2, 5))):
        kind = int(rng.integers(0, 4))
        n = int(rng.integers(1, 60000))
        if kind == 0:
            parts.append(bytes(rng.integers(0, 256, n, dtype=np.uint8)))
        elif kind == 1:
            parts.append(bytes([int(rng.integers(0, 4))]) * n)
        elif kind == 2:
            parts.append(_corpus(n, seed=seed))
        else:
            piece = bytes(rng.integers(0, 64, max(n // 4, 1),
                                       dtype=np.uint8))
            parts.append((piece * 5)[:n])
    data = b"".join(parts)
    stream = pgzf.compress(data, member_size=32768, engine="tpu")
    assert stdgzip.decompress(stream) == data
    assert pgzf.decompress(stream, engine="tpu") == data
    assert pgzf.decompress(stream, engine="native") == data
