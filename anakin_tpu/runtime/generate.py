"""Autoregressive generation: prefill + cached decode over two Nets.

The serving-side LLM loop (beyond-reference capability): the prefill Net
scores the prompt and fills the KV caches via teacher-forced decode steps
(cheap at small models; a fused prefill-cache path is the round-2
optimization), then the decode Net advances one token at a time.  Both are
ordinary jitted graphs — caches flow through named edges.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.transformer import (
    TransformerConfig,
    build_transformer_decode_step,
    build_transformer_lm,
    make_transformer_params,
)
from .net import Net

__all__ = ["GenerationSession"]


class GenerationSession:
    def __init__(self, cfg: TransformerConfig, batch: int = 1,
                 params: Optional[Dict[str, np.ndarray]] = None,
                 precision: str = "fp32", seed: int = 0):
        self.cfg = cfg
        self.batch = batch
        self.params = params if params is not None else \
            make_transformer_params(cfg, seed)
        self.decode_graph = build_transformer_decode_step(cfg, batch,
                                                          self.params)
        self.decode_net = Net(self.decode_graph, precision=precision)
        self._logits_edge = self.decode_graph.outputs[0]

    def _empty_caches(self) -> Dict[str, np.ndarray]:
        cfg, B = self.cfg, self.batch
        shape = (B, cfg.kv_heads, cfg.max_seq, cfg.head_dim)
        feed = {}
        for i in range(cfg.layers):
            feed[f"cache_k_{i}"] = np.zeros(shape, np.float32)
            feed[f"cache_v_{i}"] = np.zeros(shape, np.float32)
        return feed

    def _step(self, token: np.ndarray, pos: int, caches) -> tuple:
        feed = dict(caches)
        feed["input"] = token.reshape(self.batch, 1).astype(np.int32)
        feed["pos"] = np.full((self.batch,), pos, np.int32)
        out = self.decode_net.prediction(feed)
        logits = out[self._logits_edge]
        new_caches = {}
        for i in range(self.cfg.layers):
            node = self.decode_graph.nodes[f"dec_att_{i}"]
            new_caches[f"cache_k_{i}"] = out[node.outputs[1]]
            new_caches[f"cache_v_{i}"] = out[node.outputs[2]]
        return logits, new_caches

    def generate(self, prompt: np.ndarray, max_new_tokens: int = 16,
                 greedy: bool = True) -> np.ndarray:
        """prompt: [B, P] int32 -> [B, P + max_new_tokens]."""
        B, P = prompt.shape
        assert B == self.batch
        assert P + max_new_tokens <= self.cfg.max_seq
        caches = self._empty_caches()
        logits = None
        for t in range(P):  # prefill via decode steps (fills caches)
            logits, caches = self._step(prompt[:, t], t, caches)
        tokens = [prompt]
        cur = None
        for t in range(max_new_tokens):
            nxt = np.asarray(jnp.argmax(logits[:, 0, :], axis=-1),
                             np.int32)
            tokens.append(nxt[:, None])
            logits, caches = self._step(nxt, P + t, caches)
        return np.concatenate(tokens, axis=1)
