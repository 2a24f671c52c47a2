"""Native LVIS evaluation (the lvis-api `LVISEval` protocol,
reference: mmdet/datasets/lvis.py:238-330 evaluate / the lvis package
it wraps). Built on the in-tree COCOeval with the three LVIS protocol
changes:

1. maxDets = 300 (single threshold, no per-category cap),
2. federated annotations: an (image, category) pair is evaluated ONLY
   when the category is in the image's positive set (has gt) or its
   ``neg_category_ids`` — detections for categories the annotators
   did not verify are neither TP nor FP,
3. AP is additionally reported per frequency band (APr/APc/APf from
   each category's ``frequency`` — 'r'(are)/'c'(ommon)/'f'(requent)).
"""
from __future__ import annotations

import numpy as np

from .cocoeval import COCOeval, Params


class LVISEval(COCOeval):

    def __init__(self, lvisGt=None, lvisDt=None, iouType='bbox'):
        super().__init__(lvisGt, lvisDt, iouType)
        self.params.maxDets = [300]
        # positive + negative category sets per image (federated eval)
        self._img_pos = {}
        self._img_neg = {}
        if lvisGt is not None:
            for img_id in self.params.imgIds:
                img = lvisGt.imgs[img_id]
                self._img_neg[img_id] = set(
                    img.get('neg_category_ids', []))
                self._img_pos[img_id] = set()
            for ann in lvisGt.anns.values():
                self._img_pos.setdefault(ann['image_id'], set()).add(
                    ann['category_id'])
            # frequency band per category ('f' default when absent)
            self._cat_freq = {
                c['id']: c.get('frequency', 'f')
                for c in lvisGt.cats.values()}

    def _allowed(self, imgId, catId):
        return (catId in self._img_pos.get(imgId, ())
                or catId in self._img_neg.get(imgId, ()))

    def evaluateImg(self, imgId, catId, aRng, maxDet):
        if not self._allowed(imgId, catId):
            return None          # federated: pair not evaluated
        return super().evaluateImg(imgId, catId, aRng, maxDet)

    def summarize(self):
        """LVIS summary: AP/AP50/AP75/APs/APm/APl + APr/APc/APf + AR."""
        p = self._paramsEval
        md = p.maxDets[-1]

        def _ap(iouThr=None, areaLbl='all', freq=None):
            prec = self.eval['precision']
            aind = [i for i, l in enumerate(p.areaRngLbl)
                    if l == areaLbl]
            mind = [i for i, m in enumerate(p.maxDets) if m == md]
            s = prec[:, :, :, aind, mind[0]] if aind else prec
            s = prec[..., aind[0], mind[0]]          # (T, R, K)
            if iouThr is not None:
                t = np.where(np.isclose(p.iouThrs, iouThr))[0]
                s = s[t]
            if freq is not None:
                kidx = [k for k, cid in enumerate(p.catIds)
                        if self._cat_freq.get(cid, 'f') == freq]
                if not kidx:
                    return float('nan')
                s = s[..., kidx]
            s = s[s > -1]
            return float(np.mean(s)) if s.size else -1.0

        def _ar(areaLbl='all'):
            rec = self.eval['recall']
            aind = [i for i, l in enumerate(p.areaRngLbl)
                    if l == areaLbl]
            s = rec[:, :, aind[0], -1]
            s = s[s > -1]
            return float(np.mean(s)) if s.size else -1.0

        self.results = {
            'AP': _ap(), 'AP50': _ap(iouThr=0.5), 'AP75': _ap(iouThr=0.75),
            'APs': _ap(areaLbl='small'), 'APm': _ap(areaLbl='medium'),
            'APl': _ap(areaLbl='large'),
            'APr': _ap(freq='r'), 'APc': _ap(freq='c'),
            'APf': _ap(freq='f'),
            'AR@%d' % md: _ar(),
        }
        self.stats = np.array([
            self.results['AP'], self.results['AP50'],
            self.results['AP75'], self.results['APs'],
            self.results['APm'], self.results['APl'],
            self.results['APr'], self.results['APc'],
            self.results['APf'], self.results['AR@%d' % md]])
        for k, v in self.results.items():
            print(f'{k:>8s} = {v:.4f}')
