"""Multihost eval-gather bookkeeping (VERDICT r3 ask #9): the pad /
allgather / unpad + index-placement half of apis/test.multi_gpu_test as
pure functions, exercised over simulated unequal shards and a real
(world=1) process_allgather.

Reference analog: mmdet/apis/test.py:117-190 collect_results_cpu — the
part that pickles each rank's (index, result) pairs, pads to a common
length, gathers, and reassembles in dataset order.
"""
import numpy as np

from swindet_tpu.apis.test import (merge_gathered_results,
                                   pack_shard_results, pad_shard_payload)


def _fake_result(i):
    # mimic per-image detection output: list of per-class arrays
    rs = np.random.RandomState(i)
    return [rs.rand(i % 3, 5).astype(np.float32) for _ in range(2)]


def test_pack_pad_merge_roundtrip_unequal_shards():
    n, world = 11, 3
    shards = [list(range(r, n, world)) for r in range(world)]
    payloads = [pack_shard_results(idx, [_fake_result(i) for i in idx])
                for idx in shards]
    sizes = np.asarray([[p.size] for p in payloads], np.int64)
    maxlen = int(sizes.max())
    assert len({p.size for p in payloads}) > 1  # genuinely unequal
    gathered = np.stack([pad_shard_payload(p, maxlen)
                         for p in payloads])
    results = merge_gathered_results(gathered, sizes, n)
    assert all(r is not None for r in results)
    for i in range(n):
        expect = _fake_result(i)
        assert len(results[i]) == len(expect)
        for a, b in zip(results[i], expect):
            np.testing.assert_array_equal(a, b)


def test_roundtrip_through_real_allgather():
    """world=1 end-to-end through jax process_allgather (the collective
    the production path uses; multi-process shapes are covered by the
    simulated test above)."""
    from jax.experimental import multihost_utils
    idx = [0, 1, 2]
    arr = pack_shard_results(idx, [_fake_result(i) for i in idx])
    sizes = multihost_utils.process_allgather(
        np.asarray([arr.size], np.int64))
    padded = pad_shard_payload(arr, int(np.asarray(sizes).max()))
    gathered = multihost_utils.process_allgather(padded)
    gathered = np.asarray(gathered).reshape(1, -1)
    results = merge_gathered_results(gathered,
                                     np.asarray(sizes).reshape(1, 1), 3)
    for i in range(3):
        for a, b in zip(results[i], _fake_result(i)):
            np.testing.assert_array_equal(a, b)


def test_merge_tolerates_result_free_tail():
    """A dataset index not covered by any shard stays None (padding
    ranks in an uneven fleet)."""
    payload = pack_shard_results([0, 2], [_fake_result(0),
                                          _fake_result(2)])
    gathered = np.stack([pad_shard_payload(payload, payload.size + 7)])
    results = merge_gathered_results(gathered, np.asarray([[payload.size]]),
                                     4)
    assert results[1] is None and results[3] is None
    assert results[0] is not None and results[2] is not None
