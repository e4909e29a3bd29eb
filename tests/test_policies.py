"""Residency policies + merge scheduling (L4 research-code parity)."""

import numpy as np
import pytest

from outerspace_tpu.sched.policies import (
    merge_schedule,
    optimal_fanin,
    residency_study,
    simulate_belady,
    simulate_lru,
)


class TestCachePolicies:
    def test_belady_never_worse_than_lru(self):
        rng = np.random.default_rng(0)
        acc = rng.integers(0, 64, 4000)
        for cap in [4, 8, 16, 32]:
            lh, _ = simulate_lru(acc, cap)
            bh, _ = simulate_belady(acc, cap)
            assert bh >= lh, cap

    def test_full_capacity_all_hits_after_cold(self):
        acc = np.array([0, 1, 2, 0, 1, 2, 0, 1, 2])
        hits, misses = simulate_lru(acc, 3)
        assert misses == 3 and hits == 6
        hits, misses = simulate_belady(acc, 3)
        assert misses == 3 and hits == 6

    def test_lru_thrashing_vs_belady(self):
        # Cyclic access over capacity+1 blocks: LRU thrashes to 0 hits,
        # Belady keeps capacity-1 of them hot.
        acc = np.tile(np.arange(5), 40)
        lh, _ = simulate_lru(acc, 4)
        bh, _ = simulate_belady(acc, 4)
        assert lh == 0
        assert bh > 100

    def test_residency_study_shape(self):
        acc = np.random.default_rng(1).integers(0, 32, 500)
        out = residency_study(acc, [4, 16])
        assert set(out) == {4, 16}
        assert 0 <= out[4]["lru"] <= out[16]["belady"] <= 1

    def test_task_stream_locality(self):
        # The planner's B-major ordering concentrates block reuse: LRU at
        # tiny capacity should already capture most of it.
        from outerspace_tpu.formats import COO
        from outerspace_tpu.sched.planner import plan_outer_tiles

        rng = np.random.default_rng(2)
        d = (rng.random((160, 160)) < 0.7).astype(np.float32)
        a = COO.from_dense(d)
        sched = plan_outer_tiles(a.to_csc(), a.to_csr())
        hits, misses = simulate_lru(sched.b_block, 2)
        assert hits / max(hits + misses, 1) > 0.5


class TestMergeSchedule:
    def test_binary_merge_cost_is_huffman(self):
        sizes = [1, 2, 3, 4]
        steps, cost = merge_schedule(sizes, 2)
        # Huffman: merge 1+2=3 (cost 3), 3+3=6 (cost 6), 6+4=10 (cost 10)
        assert cost == 19
        assert len(steps) == 3

    def test_wide_merge_single_step(self):
        sizes = [5, 5, 5, 5]
        steps, cost = merge_schedule(sizes, 4)
        assert len(steps) == 1 and cost == 20

    def test_empty(self):
        assert merge_schedule([], 2) == ([], 0)

    def test_optimal_fanin_prefers_wide_for_many_runs(self):
        sizes = [10] * 64
        assert optimal_fanin(sizes) >= 4
