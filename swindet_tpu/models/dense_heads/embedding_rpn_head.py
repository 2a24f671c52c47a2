"""Embedding RPN (reference:
mmdet/models/dense_heads/embedding_rpn_head.py:9 EmbeddingRPNHead) —
learned proposal boxes + features for Sparse R-CNN; no FPN input.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from ..builder import HEADS
from ...core.bbox.transforms import bbox_cxcywh_to_xyxy


@HEADS.register_module()
class EmbeddingRPNHead(nn.Module):
    num_proposals: int = 100
    proposal_feature_channel: int = 256
    dtype: Any = jnp.float32

    def setup(self):
        # whole-image init (reference init_weights:37: cxcywh
        # [0.5, 0.5, 1, 1]) — stored directly in cxcywh like the
        # reference's Embedding weight
        self.init_proposal_bboxes = self.param(
            'init_proposal_bboxes',
            lambda rng, shape: jnp.tile(
                jnp.asarray([[0.5, 0.5, 1.0, 1.0]], jnp.float32),
                (shape[0], 1)), (self.num_proposals, 4))
        self.init_proposal_features = self.param(
            'init_proposal_features', nn.initializers.normal(1.0),
            (self.num_proposals, self.proposal_feature_channel))

    def __call__(self, img_shapes):
        """img_shapes (B, 2) [h, w] -> (proposals (B, P, 4) xyxy pixels,
        features (B, P, C), imgs_whwh (B, 4))."""
        b = img_shapes.shape[0]
        imgs_whwh = jnp.stack(
            [img_shapes[:, 1], img_shapes[:, 0],
             img_shapes[:, 1], img_shapes[:, 0]], -1).astype(jnp.float32)
        proposals = bbox_cxcywh_to_xyxy(
            self.init_proposal_bboxes.astype(jnp.float32))
        proposals = proposals[None] * imgs_whwh[:, None, :]
        feats = jnp.broadcast_to(
            self.init_proposal_features[None].astype(self.dtype),
            (b, self.num_proposals, self.proposal_feature_channel))
        return proposals, feats, imgs_whwh
