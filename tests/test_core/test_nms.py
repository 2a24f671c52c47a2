"""NMS exactness tests: the tiled TPU algorithm must reproduce sequential
greedy NMS keep-sets exactly (SURVEY.md §7 hard part #2)."""
import numpy as np
import jax
import jax.numpy as jnp

from swindet_tpu.core import batched_nms, multiclass_nms, nms


def np_greedy_nms(boxes, scores, thr):
    """Independent sequential reference NMS."""
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i] or not np.isfinite(scores[i]):
            continue
        keep.append(i)
        bi = boxes[i]
        for j in order:
            if suppressed[j] or j == i:
                continue
            lt = np.maximum(bi[:2], boxes[j][:2])
            rb = np.minimum(bi[2:], boxes[j][2:])
            wh = np.clip(rb - lt, 0, None)
            inter = wh[0] * wh[1]
            a1 = (bi[2] - bi[0]) * (bi[3] - bi[1])
            a2 = (boxes[j][2] - boxes[j][0]) * (boxes[j][3] - boxes[j][1])
            iou = inter / max(a1 + a2 - inter, 1e-10)
            if iou > thr and scores[j] < scores[i]:
                suppressed[j] = True
    return keep


def random_boxes(rng, n, span=100.0):
    b = rng.rand(n, 4) * span
    b[:, 2:] = b[:, :2] + rng.rand(n, 2) * span * 0.3 + 1
    return b.astype(np.float32)


class TestNMS:
    def test_exact_vs_sequential(self, rng):
        for n in (17, 128, 300, 700):
            boxes = random_boxes(rng, n, span=60.0)  # dense → overlaps
            scores = rng.rand(n).astype(np.float32)
            res = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, n)
            got = np.asarray(res.inds)[np.asarray(res.valid)]
            want = np_greedy_nms(boxes, scores, 0.5)
            np.testing.assert_array_equal(got, want)

    def test_invalid_masked(self, rng):
        boxes = random_boxes(rng, 50)
        scores = rng.rand(50).astype(np.float32)
        valid = np.ones(50, bool)
        valid[::3] = False
        res = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 50,
                  valid=jnp.asarray(valid))
        kept = np.asarray(res.inds)[np.asarray(res.valid)]
        assert not set(kept) & set(np.where(~valid)[0])
        want = np_greedy_nms(boxes[valid],
                             scores[valid], 0.5)
        want_orig = np.where(valid)[0][want]
        np.testing.assert_array_equal(kept, want_orig)

    def test_max_out_truncates(self, rng):
        boxes = random_boxes(rng, 200, span=1000.0)  # sparse → few suppress
        scores = rng.rand(200).astype(np.float32)
        res = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 10)
        assert int(np.asarray(res.valid).sum()) == 10
        # kept are the highest-scored survivors, in score order
        s = np.asarray(res.dets[:, 4])
        assert np.all(np.diff(s[np.asarray(res.valid)]) <= 1e-6)

    def test_identical_boxes(self):
        boxes = jnp.tile(jnp.array([[0., 0., 10., 10.]]), (5, 1))
        scores = jnp.array([0.9, 0.8, 0.7, 0.6, 0.5])
        res = nms(boxes, scores, 0.5, 5)
        assert int(np.asarray(res.valid).sum()) == 1
        assert int(res.inds[0]) == 0

    def test_suppression_chain(self):
        # 0 suppresses 1; 1 would suppress 2 but is dead → 2 survives
        # iou(0,1) = iou(1,2) = 70/130 ≈ 0.54 > 0.5; iou(0,2) = 0.25 < 0.5
        boxes = jnp.array([[0., 0., 10., 10.],
                           [3., 0., 13., 10.],
                           [6., 0., 16., 10.]])
        scores = jnp.array([0.9, 0.8, 0.7])
        res = nms(boxes, scores, 0.5, 3)
        kept = np.asarray(res.inds)[np.asarray(res.valid)]
        np.testing.assert_array_equal(kept, [0, 2])

    def test_jit(self, rng):
        boxes = random_boxes(rng, 256)
        scores = rng.rand(256).astype(np.float32)
        f = jax.jit(lambda b, s: nms(b, s, 0.5, 100))
        res = f(jnp.asarray(boxes), jnp.asarray(scores))
        want = np_greedy_nms(boxes, scores, 0.5)[:100]
        got = np.asarray(res.inds)[np.asarray(res.valid)]
        np.testing.assert_array_equal(got, want)


class TestBatchedNMS:
    def test_classes_dont_interact(self, rng):
        boxes = np.tile(random_boxes(rng, 30), (2, 1))
        scores = rng.rand(60).astype(np.float32)
        idxs = np.repeat([0, 1], 30)
        res = batched_nms(jnp.asarray(boxes), jnp.asarray(scores),
                          jnp.asarray(idxs), 0.5, 60)
        kept = np.asarray(res.inds)[np.asarray(res.valid)]
        # per-class keep sets must match per-class sequential NMS
        for c in (0, 1):
            want = np_greedy_nms(boxes[idxs == c], scores[idxs == c], 0.5)
            want_orig = np.where(idxs == c)[0][want]
            np.testing.assert_array_equal(
                sorted(k for k in kept if idxs[k] == c), sorted(want_orig))

    def test_unshifted_boxes_returned(self, rng):
        boxes = random_boxes(rng, 20)
        scores = rng.rand(20).astype(np.float32)
        idxs = rng.randint(0, 3, 20)
        res = batched_nms(jnp.asarray(boxes), jnp.asarray(scores),
                          jnp.asarray(idxs), 0.5, 20)
        v = np.asarray(res.valid)
        np.testing.assert_allclose(np.asarray(res.dets[:, :4])[v],
                                   boxes[np.asarray(res.inds)[v]], rtol=1e-4,
                                   atol=1e-3)


class TestMulticlassNMS:
    def test_basic(self, rng):
        n, c = 40, 4
        boxes = random_boxes(rng, n)
        scores = rng.rand(n, c + 1).astype(np.float32) * 0.5
        scores[0, 1] = 0.95
        res = multiclass_nms(jnp.asarray(boxes), jnp.asarray(scores),
                             score_thr=0.05,
                             nms_cfg=dict(iou_threshold=0.5),
                             max_per_img=10)
        v = np.asarray(res.valid)
        assert v.sum() > 0
        # top detection is box 0, class 1
        assert int(res.inds[0]) == 0 and int(res.labels[0]) == 1
        assert abs(float(res.dets[0, 4]) - 0.95) < 1e-5

    def test_score_thr_filters(self, rng):
        n, c = 20, 3
        boxes = random_boxes(rng, n)
        scores = np.full((n, c + 1), 0.01, np.float32)
        res = multiclass_nms(jnp.asarray(boxes), jnp.asarray(scores),
                             score_thr=0.05,
                             nms_cfg=dict(iou_threshold=0.5), max_per_img=10)
        assert int(np.asarray(res.valid).sum()) == 0

    def test_per_class_boxes(self, rng):
        n, c = 10, 2
        boxes = np.concatenate([random_boxes(rng, n)] * c, axis=1)
        scores = rng.rand(n, c + 1).astype(np.float32)
        res = multiclass_nms(jnp.asarray(boxes), jnp.asarray(scores),
                             score_thr=0.05,
                             nms_cfg=dict(iou_threshold=0.5), max_per_img=20)
        assert res.dets.shape == (20, 5)
