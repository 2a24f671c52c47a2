// Native mask runtime for swindet_tpu (C ABI, loaded via ctypes).
//
// The COCO segm eval host path — RLE codec, pairwise mask IoU, and
// paste-to-canvas — is the wall-clock bottleneck of large-scale
// evaluation when done in numpy (the reference gets this from
// pycocotools' C extension; reference usage: mmdet/datasets/coco.py
// evaluate + mmdet/models/roi_heads/mask_heads/fcn_mask_head.py:306
// _do_paste_mask). This file is the TPU framework's equivalent native
// component: plain C++17, no Python headers, numpy buffers in/out.
//
// RLE convention (pycocotools): uncompressed counts are alternating
// background/foreground run lengths over the COLUMN-MAJOR flattening
// of the (h, w) mask, starting with background.
#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// ---------------------------------------------------------------- codec
// counts -> column-major bitmap (caller allocates h*w bytes)
void rle_decode(const uint32_t* counts, int64_t n, uint8_t* out,
                int64_t size) {
    int64_t pos = 0;
    uint8_t v = 0;
    for (int64_t i = 0; i < n && pos < size; ++i) {
        int64_t run = counts[i];
        if (run > size - pos) run = size - pos;
        if (v) memset(out + pos, 1, (size_t)run);
        else memset(out + pos, 0, (size_t)run);
        pos += run;
        v ^= 1;
    }
    if (pos < size) memset(out + pos, 0, (size_t)(size - pos));
}

// column-major bitmap -> counts; returns number of counts written
// (caller provides out buffer of size size+1)
int64_t rle_encode(const uint8_t* mask, int64_t size, uint32_t* out) {
    int64_t n = 0;
    uint8_t cur = 0;         // runs start at background
    int64_t run = 0;
    for (int64_t i = 0; i < size; ++i) {
        uint8_t v = mask[i] ? 1 : 0;
        if (v == cur) {
            ++run;
        } else {
            out[n++] = (uint32_t)run;
            cur = v;
            run = 1;
        }
    }
    out[n++] = (uint32_t)run;
    return n;
}

static inline uint64_t rle_area_one(const uint32_t* c, int64_t n) {
    uint64_t a = 0;
    for (int64_t i = 1; i < n; i += 2) a += c[i];
    return a;
}

// intersection area of two RLEs (same canvas)
static uint64_t rle_intersect(const uint32_t* a, int64_t na,
                              const uint32_t* b, int64_t nb) {
    int64_t ia = 0, ib = 0;
    int64_t enda = na ? (int64_t)a[0] : 0;
    int64_t endb = nb ? (int64_t)b[0] : 0;
    bool fa = false, fb = false;     // run 0 is background
    int64_t pos = 0;
    uint64_t inter = 0;
    while (ia < na && ib < nb) {
        int64_t e = std::min(enda, endb);
        if (fa && fb) inter += (uint64_t)(e - pos);
        pos = e;
        if (enda == e) {
            ++ia;
            fa = !fa;
            if (ia < na) enda += (int64_t)a[ia];
        }
        if (endb == e) {
            ++ib;
            fb = !fb;
            if (ib < nb) endb += (int64_t)b[ib];
        }
    }
    return inter;
}

// ------------------------------------------------------------------ iou
// Pairwise IoU of n_dt x n_gt RLE masks. counts are concatenated with
// prefix offsets (offsets[i]..offsets[i+1] is mask i's counts).
// iscrowd: per-gt flag; crowd gt uses union = area(dt)
// (pycocotools maskUtils.iou semantics).
void rle_iou(const uint32_t* dt_counts, const int64_t* dt_off, int64_t n_dt,
             const uint32_t* gt_counts, const int64_t* gt_off, int64_t n_gt,
             const uint8_t* iscrowd, double* out) {
    for (int64_t i = 0; i < n_dt; ++i) {
        const uint32_t* dc = dt_counts + dt_off[i];
        int64_t dn = dt_off[i + 1] - dt_off[i];
        uint64_t da = rle_area_one(dc, dn);
        for (int64_t j = 0; j < n_gt; ++j) {
            const uint32_t* gc = gt_counts + gt_off[j];
            int64_t gn = gt_off[j + 1] - gt_off[j];
            uint64_t inter = rle_intersect(dc, dn, gc, gn);
            uint64_t uni;
            if (iscrowd[j]) {
                uni = da;
            } else {
                uni = da + rle_area_one(gc, gn) - inter;
            }
            out[i * n_gt + j] = uni ? (double)inter / (double)uni : 0.0;
        }
    }
}

// ---------------------------------------------------------------- paste
// Paste (n, s, s) float mask probabilities into an (img_h, img_w)
// canvas at boxes (x1, y1, x2, y2), threshold, write (n, img_h, img_w)
// uint8. grid_sample align_corners=False semantics with zero padding
// (reference: fcn_mask_head.py:306 _do_paste_mask).
void paste_masks(const float* probs, int64_t n, int64_t s,
                 const float* boxes, int64_t img_h, int64_t img_w,
                 float thr, uint8_t* out) {
    memset(out, 0, (size_t)(n * img_h * img_w));
    for (int64_t k = 0; k < n; ++k) {
        const float* m = probs + k * s * s;
        uint8_t* o = out + k * img_h * img_w;
        float x1 = boxes[k * 4 + 0], y1 = boxes[k * 4 + 1];
        float x2 = boxes[k * 4 + 2], y2 = boxes[k * 4 + 3];
        float w = x2 - x1, h = y2 - y1;
        if (w <= 0.f || h <= 0.f) continue;
        int64_t ix1 = std::max<int64_t>((int64_t)std::floor(x1) - 1, 0);
        int64_t iy1 = std::max<int64_t>((int64_t)std::floor(y1) - 1, 0);
        int64_t ix2 = std::min<int64_t>((int64_t)std::ceil(x2) + 1, img_w);
        int64_t iy2 = std::min<int64_t>((int64_t)std::ceil(y2) + 1, img_h);
        for (int64_t yy = iy1; yy < iy2; ++yy) {
            float sy = ((float)yy + 0.5f - y1) / h * (float)s - 0.5f;
            int64_t y0 = (int64_t)std::floor(sy);
            float fy = sy - (float)y0;
            bool v0 = (y0 >= 0 && y0 < s);
            bool v1 = (y0 + 1 >= 0 && y0 + 1 < s);
            const float* r0 = v0 ? m + y0 * s : nullptr;
            const float* r1 = v1 ? m + (y0 + 1) * s : nullptr;
            uint8_t* orow = o + yy * img_w;
            for (int64_t xx = ix1; xx < ix2; ++xx) {
                float sx = ((float)xx + 0.5f - x1) / w * (float)s - 0.5f;
                int64_t x0 = (int64_t)std::floor(sx);
                float fx = sx - (float)x0;
                bool u0 = (x0 >= 0 && x0 < s);
                bool u1 = (x0 + 1 >= 0 && x0 + 1 < s);
                float v00 = (r0 && u0) ? r0[x0] : 0.f;
                float v01 = (r0 && u1) ? r0[x0 + 1] : 0.f;
                float v10 = (r1 && u0) ? r1[x0] : 0.f;
                float v11 = (r1 && u1) ? r1[x0 + 1] : 0.f;
                float val = v00 * (1 - fy) * (1 - fx)
                          + v01 * (1 - fy) * fx
                          + v10 * fy * (1 - fx)
                          + v11 * fy * fx;
                orow[xx] = val >= thr ? 1 : 0;
            }
        }
    }
}

}  // extern "C"
