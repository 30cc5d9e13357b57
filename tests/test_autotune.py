"""Autotune cache plumbing (device-independent; the measured sweep itself
runs on TPU via benchmarks/gemm_sol.py or autotune_int4 directly)."""

class TestAutotuneCache:
    """Cache plumbing runs anywhere; the measured sweep itself is TPU-only
    (exercised by the tpu-marked suite / benchmarks)."""

    def test_candidates_all_legal(self):
        from ao_tpu.ops.pallas.int4_matmul import candidate_tiles, _valid_tkp

        for (m, k, n, g) in [(8, 4096, 4096, 128), (33, 2048, 1024, 64),
                             (512, 4096, 11008, 32)]:
            cands = candidate_tiles(m, k // 2, n, g)
            assert cands
            for tm, tkp, tn in cands:
                assert _valid_tkp(tkp, k // 2, g)
                assert n % tn == 0
                assert tm % 8 == 0 or tm >= min(m, 256)

    def test_lookup_roundtrip(self, tmp_path, monkeypatch):
        monkeypatch.setenv("AO_TPU_NATIVE_CACHE", str(tmp_path))
        import ao_tpu.ops.pallas.autotune as at
        at._CACHE = None  # drop any cache loaded under the old path
        key = at._key("int4_wo_matmul", 8, 4096, 4096, 128)
        assert at.lookup_tuned("int4_wo_matmul", 8, 4096, 4096, 128) is None
        at._store(key, (8, 2048, 512))
        assert at.lookup_tuned("int4_wo_matmul", 8, 4096, 4096, 128) == \
            [8, 2048, 512]
        # persisted: a fresh load from disk sees it
        at._CACHE = None
        assert at.lookup_tuned("int4_wo_matmul", 8, 4096, 4096, 128) == \
            [8, 2048, 512]
        at._CACHE = None  # leave no cross-test state

    def test_pick_tiles_prefers_tuned(self, tmp_path, monkeypatch):
        monkeypatch.setenv("AO_TPU_NATIVE_CACHE", str(tmp_path))
        import ao_tpu.ops.pallas.autotune as at
        from ao_tpu.ops.pallas.int4_matmul import _pick_tiles
        at._CACHE = None
        heur = _pick_tiles(8, 2048, 4096, 128)
        at._store(at._key("int4_wo_matmul", 8, 4096, 4096, 128),
                  (8, 1024, 256))
        assert _pick_tiles(8, 2048, 4096, 128) == (8, 1024, 256)
        assert heur != (8, 1024, 256)
        # illegal tuned entries are ignored, not trusted
        at._store(at._key("int4_wo_matmul", 8, 4096, 4096, 128),
                  (8, 100, 256))
        assert _pick_tiles(8, 2048, 4096, 128) == heur
        at._CACHE = None
