"""Pure-torch greedy NMS matching mmcv.ops.nms public semantics."""
import torch


def nms(boxes, scores, iou_threshold, offset=0, score_threshold=0,
        max_num=-1):
    assert offset in (0, 1)
    if boxes.numel() == 0:
        keep = boxes.new_zeros(0, dtype=torch.long)
        dets = boxes.new_zeros(0, 5)
        return dets, keep
    order = torch.argsort(scores, descending=True, stable=True)
    x1, y1, x2, y2 = boxes.unbind(dim=1)
    areas = (x2 - x1 + offset) * (y2 - y1 + offset)
    keep = []
    suppressed = torch.zeros(boxes.shape[0], dtype=torch.bool)
    for idx in order.tolist():
        if suppressed[idx]:
            continue
        keep.append(idx)
        xx1 = torch.maximum(x1[idx], x1)
        yy1 = torch.maximum(y1[idx], y1)
        xx2 = torch.minimum(x2[idx], x2)
        yy2 = torch.minimum(y2[idx], y2)
        w = (xx2 - xx1 + offset).clamp(min=0)
        h = (yy2 - yy1 + offset).clamp(min=0)
        inter = w * h
        iou = inter / (areas[idx] + areas - inter)
        suppressed |= iou > iou_threshold
    keep = torch.as_tensor(keep, dtype=torch.long)
    if max_num > 0:
        keep = keep[:max_num]
    dets = torch.cat([boxes[keep], scores[keep, None]], dim=1)
    return dets, keep


def batched_nms(boxes, scores, idxs, nms_cfg, class_agnostic=False):
    nms_cfg_ = dict(nms_cfg).copy()
    class_agnostic = nms_cfg_.pop('class_agnostic', class_agnostic)
    nms_type = nms_cfg_.pop('type', 'nms')
    assert nms_type in ('nms', 'soft_nms'), \
        f'shim supports nms/soft_nms, got {nms_type}'
    if nms_type == 'soft_nms':
        if class_agnostic or boxes.numel() == 0:
            boxes_for_nms = boxes
        else:
            max_coordinate = boxes.max()
            offsets = idxs.to(boxes) * (
                max_coordinate + torch.tensor(1).to(boxes))
            boxes_for_nms = boxes + offsets[:, None]
        dets, keep = soft_nms(boxes_for_nms, scores, **nms_cfg_)
        return torch.cat([boxes[keep], dets[:, -1, None]], -1), keep
    nms_cfg_.pop('split_thr', None)
    if class_agnostic or boxes.numel() == 0:
        boxes_for_nms = boxes
    else:
        max_coordinate = boxes.max()
        offsets = idxs.to(boxes) * (max_coordinate + torch.tensor(1).to(boxes))
        boxes_for_nms = boxes + offsets[:, None]
    dets, keep = nms(boxes_for_nms, scores, **nms_cfg_)
    boxes = boxes[keep]
    scores = dets[:, -1]
    return torch.cat([boxes, scores[:, None]], -1), keep


def nms_match(dets, iou_threshold):
    """Greedy NMS that returns the suppression groups."""
    if dets.numel() == 0:
        return []
    scores = dets[:, 4]
    order = torch.argsort(scores, descending=True, stable=True)
    boxes = dets[:, :4]
    x1, y1, x2, y2 = boxes.unbind(dim=1)
    areas = (x2 - x1) * (y2 - y1)
    matched = torch.zeros(dets.shape[0], dtype=torch.bool)
    groups = []
    for idx in order.tolist():
        if matched[idx]:
            continue
        xx1 = torch.maximum(x1[idx], x1)
        yy1 = torch.maximum(y1[idx], y1)
        xx2 = torch.minimum(x2[idx], x2)
        yy2 = torch.minimum(y2[idx], y2)
        inter = (xx2 - xx1).clamp(min=0) * (yy2 - yy1).clamp(min=0)
        iou = inter / (areas[idx] + areas - inter)
        members = [idx]
        for j in order.tolist():
            if j != idx and not matched[j] and iou[j] > iou_threshold:
                members.append(j)
                matched[j] = True
        matched[idx] = True
        groups.append(torch.as_tensor(members, dtype=torch.long))
    return groups


def soft_nms(boxes, scores, iou_threshold=0.3, sigma=0.5, min_score=1e-3,
             method='linear', offset=0):
    """Pure-torch soft-NMS matching mmcv.ops.soft_nms semantics: greedy
    max-score selection; each selection decays surviving neighbours
    (linear / gaussian / naive); boxes whose decayed score drops to
    <= min_score leave the pool and never decay anyone. Returns
    (dets (K,5) in selection order with decayed scores, original
    indices)."""
    assert offset in (0, 1)
    assert method in ('linear', 'gaussian', 'naive')
    n = boxes.shape[0]
    if n == 0:
        return boxes.new_zeros(0, 5), boxes.new_zeros(
            0, dtype=torch.long)
    x1, y1, x2, y2 = boxes.float().unbind(dim=1)
    areas = (x2 - x1 + offset) * (y2 - y1 + offset)
    cur = scores.clone().float()
    alive = torch.ones(n, dtype=torch.bool)
    keep, out_scores = [], []
    for _ in range(n):
        if not bool(alive.any()):
            break
        masked = torch.where(alive, cur,
                             torch.full_like(cur, -float('inf')))
        i = int(torch.argmax(masked))
        if cur[i] <= min_score:
            break
        keep.append(i)
        out_scores.append(float(cur[i]))
        alive[i] = False
        xx1 = torch.maximum(x1[i], x1)
        yy1 = torch.maximum(y1[i], y1)
        xx2 = torch.minimum(x2[i], x2)
        yy2 = torch.minimum(y2[i], y2)
        w = (xx2 - xx1 + offset).clamp(min=0)
        h = (yy2 - yy1 + offset).clamp(min=0)
        inter = w * h
        iou = inter / (areas[i] + areas - inter)
        if method == 'linear':
            decay = torch.where(iou > iou_threshold, 1.0 - iou,
                                torch.ones_like(iou))
        elif method == 'gaussian':
            decay = torch.exp(-(iou * iou) / sigma)
        else:  # naive = hard nms
            decay = torch.where(iou > iou_threshold,
                                torch.zeros_like(iou),
                                torch.ones_like(iou))
        cur = torch.where(alive, cur * decay, cur)
        alive &= cur > min_score
    keep = torch.as_tensor(keep, dtype=torch.long)
    dets = torch.cat(
        [boxes[keep].float(),
         torch.as_tensor(out_scores, dtype=torch.float32)[:, None]], 1)
    return dets, keep
