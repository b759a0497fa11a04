"""Speculative decoding: draft-model proposals verified in target chunks.

Beyond-reference serving capability (the reference predates LLMs; its
closest analog is the Worker pipeline hiding latency with threads —
SURVEY.md §2.10).  Greedy speculative decoding is exact: the emitted
sequence is IDENTICAL to vanilla greedy decoding of the target model —
the draft only changes how many target dispatches it takes.

Mechanics (one jitted `mha_verify` chunk per round, `runtime/generate.py`
handles the vanilla path):

  1. draft autoregressively proposes `k` tokens (cheap model, k tiny
     decode dispatches);
  2. target scores [committed_token, d_1..d_k] in ONE verify chunk at
     positions pos..pos+k, writing those cache rows;
  3. the longest prefix of drafts matching the target's own argmax is
     accepted; the first mismatch position yields the corrected token
     "for free" (so every round commits >= 1 token, <= k+1 tokens);
  4. rejected rows in both models' caches stay stale but are never
     attended (per-token position masks) and are overwritten by the next
     round's chunk write — rollback costs nothing.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ..models.transformer import (
    TransformerConfig,
    build_transformer_verify_step,
    make_transformer_params,
)
from .generate import GenerationSession
from .net import Net

__all__ = ["SpeculativeSession"]


class SpeculativeSession:
    """Greedy speculative decoding with a small draft transformer.

    batch=1 (the latency path speculative decoding exists for; throughput
    batches keep the dense `DecodeScheduler`).
    """

    def __init__(self, cfg: TransformerConfig, draft_cfg: TransformerConfig,
                 params: Optional[Dict[str, np.ndarray]] = None,
                 draft_params: Optional[Dict[str, np.ndarray]] = None,
                 k: int = 4, precision: str = "fp32", seed: int = 0,
                 kv_cache_dtype: str = "float32", kv_scale: float = 0.05):
        self.k = int(k)
        self._kv_cache_dtype = kv_cache_dtype
        self._kv_scale = kv_scale
        self._precision = precision
        # exact-length prefill (no bucketing): the fused loop compiles per
        # (P, N) anyway, and bucket padding's ~1e-6 prefill perturbation
        # flips near-tie argmaxes between the draft and verify paths,
        # costing acceptance for nothing (see GenerationSession).
        self.target = GenerationSession(
            cfg, batch=1, params=params, precision=precision, seed=seed,
            kv_cache_dtype=kv_cache_dtype, kv_scale=kv_scale,
            prefill_buckets=False)
        self.draft = GenerationSession(
            draft_cfg, batch=1,
            params=(draft_params if draft_params is not None
                    else make_transformer_params(draft_cfg, seed + 1)),
            prefill_buckets=False,
            precision=precision)
        self.verify_graph = build_transformer_verify_step(
            cfg, 1, self.k + 1, self.target.params,
            kv_cache_dtype=kv_cache_dtype, kv_scale=kv_scale)
        self.verify_net = Net(self.verify_graph, precision=precision)
        # telemetry (parity with Worker latency bookkeeping)
        self.rounds = 0
        self.tokens_committed = 0
        self.drafts_accepted = 0
        self.drafts_proposed = 0
        self._fused_runs = {}     # (P, N) -> compiled fused loop
        self._round_run = None    # compiled one-round program (split mode)
        self._verify_nets = {self.k: (self.verify_net, self.verify_graph)}

    def _verify_net_for(self, k: int):
        """Verify net for chunk k+1 (adaptive-k rounds compile one small
        program per distinct k — bounded by the k ladder, not by N)."""
        ent = self._verify_nets.get(k)
        if ent is None:
            g = build_transformer_verify_step(
                self.target.cfg, 1, k + 1, self.target.params,
                kv_cache_dtype=self._kv_cache_dtype,
                kv_scale=self._kv_scale)
            ent = (Net(g, precision=self._precision,
                       device_params=self.verify_net.params), g)
            self._verify_nets[k] = ent
        return ent

    def _verify(self, tokens: np.ndarray, pos: int, caches, k: int = None):
        """tokens: [1, k+1] — committed token + k drafts.  Returns
        (argmax next-token per position [k+1], new caches)."""
        net, graph = self._verify_net_for(self.k if k is None else k)
        feed = dict(caches)
        feed["input"] = tokens.astype(np.int32)
        feed["pos"] = np.full((1,), pos, np.int32)
        out = net.prediction(feed)
        logits = np.asarray(out[graph.outputs[0]])
        new_caches = {}
        for i in range(self.target.cfg.layers):
            node = graph.nodes[f"ver_att_{i}"]
            new_caches[f"cache_k_{i}"] = out[node.outputs[1]]
            new_caches[f"cache_v_{i}"] = out[node.outputs[2]]
        return np.argmax(logits[0], axis=-1).astype(np.int32), new_caches

    @property
    def acceptance_rate(self) -> float:
        drafted = self.drafts_proposed or self.rounds * self.k
        return self.drafts_accepted / drafted if drafted else 0.0

    def generate(self, prompt: np.ndarray, max_new_tokens: int = 16,
                 adaptive_k: bool = False, k_min: int = 1,
                 k_max: int = 8) -> np.ndarray:
        """prompt: [1, P] int32 -> [1, P + max_new_tokens]; exact greedy
        equality with `GenerationSession.generate`.

        `adaptive_k=True` (round-5, VERDICT task 7): per-round draft
        length follows acceptance — a fully accepted round doubles k (up
        to k_max), a 0-acceptance round halves it (down to k_min).
        Chunk programs compile once per distinct k (the ladder is
        log-bounded).  Exactness is unaffected — k only changes how
        many target dispatches the same greedy sequence takes."""
        B, P = prompt.shape
        assert B == 1, "speculative decoding is the batch=1 latency path"
        assert P + max_new_tokens + (k_max if adaptive_k else self.k) + 1 \
            <= self.target.cfg.max_seq
        t_logits, t_caches = self.target._prefill(prompt)
        d_logits, d_caches = self.draft._prefill(prompt)
        committed = [int(np.argmax(t_logits[0, 0]))]   # token at pos P
        pos = P                                         # its position
        k = self.k
        while len(committed) < max_new_tokens:
            # 1) draft proposes k continuations of the last committed token
            drafts = []
            cur = committed[-1]
            dpos = pos
            for _ in range(k):
                d_logits, d_caches = self.draft._step(
                    np.array([cur], np.int32), dpos, d_caches)
                cur = int(np.argmax(d_logits[0, 0]))
                drafts.append(cur)
                dpos += 1
            # 2) one target chunk scores committed[-1] + drafts
            chunk = np.array([[committed[-1]] + drafts], np.int32)
            nxt, t_caches = self._verify(chunk, pos, t_caches, k=k)
            # 3) accept the longest matching prefix; nxt[a] is the
            #    correction (mismatch) or bonus (all accepted) token
            a = 0
            while a < k and nxt[a] == drafts[a] \
                    and len(committed) + a + 1 < max_new_tokens:
                a += 1
            committed.extend(drafts[:a])
            if len(committed) < max_new_tokens:
                committed.append(int(nxt[a]))
            pos += a + 1
            self.rounds += 1
            self.drafts_accepted += a
            self.drafts_proposed += k
            self.tokens_committed += a + 1
            if adaptive_k:
                k = min(k * 2, k_max) if a == k else \
                    (max(k // 2, k_min) if a == 0 else k)
        out = np.array(committed[:max_new_tokens], np.int32)[None]
        return np.concatenate([prompt.astype(np.int32), out], axis=1)

    # ------------------------------------------------------------ fused path
    def generate_fused(self, prompt: np.ndarray,
                       max_new_tokens: int = 16) -> np.ndarray:
        """TPU-native speculative loop: each round (k draft decode steps +
        one target verify + acceptance) is ONE XLA program, and rounds run
        inside a single jitted `lax.while_loop` — the whole generation is
        ONE dispatch after prefill (vs k+1 dispatches per round for the
        host loop).  Token-exact with `generate`.
        """
        import jax
        import jax.numpy as jnp
        from jax import lax

        B, P = prompt.shape
        assert B == 1
        N = int(max_new_tokens)
        k = self.k
        cfgT, cfgD = self.target.cfg, self.draft.cfg
        assert P + N + k + 1 <= cfgT.max_seq
        t_logits, t_caches_np = self.target._prefill(prompt)
        d_logits, d_caches_np = self.draft._prefill(prompt)
        t0 = jnp.argmax(jnp.asarray(t_logits)[0, 0]).astype(jnp.int32)
        t_caches = tuple(jnp.asarray(t_caches_np[f"cache_{kv}_{i}"])
                         for i in range(cfgT.layers) for kv in ("k", "v"))
        d_caches = tuple(jnp.asarray(d_caches_np[f"cache_{kv}_{i}"])
                         for i in range(cfgD.layers) for kv in ("k", "v"))
        run = self._fused_runs.get((P, N))
        if run is None:
            run = self._build_fused(P, N)
            self._fused_runs[(P, N)] = run
        buf, rounds, accepted = run(
            self.verify_net.params, self.draft.decode_net.params,
            t0, t_caches, d_caches)
        self.rounds += int(rounds)
        self.drafts_accepted += int(accepted)
        self.drafts_proposed += int(rounds) * k
        self.tokens_committed += N
        return np.concatenate(
            [prompt.astype(np.int32), np.asarray(buf, np.int32)[None]],
            axis=1)

    # ------------------------------------------------------ round-fused path
    def generate_round_fused(self, prompt: np.ndarray,
                             max_new_tokens: int = 16) -> np.ndarray:
        """Split-compile speculative loop: ONE dispatch per round (k draft
        steps + target verify + acceptance fused), host loop over rounds.

        Exists because the whole-generation `generate_fused` program can
        exceed the remote-compile relay's request-size cap (HTTP 413 —
        measured, round 3); the per-round program is ~1/rounds the size,
        is position-parameterized (ONE compile serves every round and
        every prompt length), and still cuts dispatches k+1 -> 1 per
        round vs the host loop.  Token-exact with `generate`.
        """
        import jax.numpy as jnp

        B, P = prompt.shape
        assert B == 1, "speculative decoding is the batch=1 latency path"
        N = int(max_new_tokens)
        k = self.k
        assert P + N + k + 1 <= self.target.cfg.max_seq
        t_logits, t_caches_np = self.target._prefill(prompt)
        d_logits, d_caches_np = self.draft._prefill(prompt)
        t_caches = tuple(jnp.asarray(t_caches_np[f"cache_{kv}_{i}"])
                         for i in range(self.target.cfg.layers)
                         for kv in ("k", "v"))
        d_caches = tuple(jnp.asarray(d_caches_np[f"cache_{kv}_{i}"])
                         for i in range(self.draft.cfg.layers)
                         for kv in ("k", "v"))
        if self._round_run is None:
            self._round_run = self._build_round()
        committed = [int(np.argmax(np.asarray(t_logits)[0, 0]))]
        pos = P
        while len(committed) < N:
            commit, a, t_caches, d_caches = self._round_run(
                self.verify_net.params, self.draft.decode_net.params,
                jnp.int32(committed[-1]), jnp.int32(pos),
                t_caches, d_caches)
            a = int(a)
            take = min(a + 1, N - len(committed))
            committed.extend(int(t) for t in np.asarray(commit)[:take])
            pos += a + 1
            self.rounds += 1
            self.drafts_proposed += self.k
            # commit[:take] are all drafts unless the correction token
            # (index a) made the cut — i.e. unless take == a + 1
            self.drafts_accepted += a if take == a + 1 else take
            self.tokens_committed += take
        out = np.array(committed[:N], np.int32)[None]
        return np.concatenate([prompt.astype(np.int32), out], axis=1)

    def _build_round(self):
        """One speculative round as a single jitted program:
        (cur, pos, caches) -> (commit[k+1], accepted, new caches)."""
        import jax
        import jax.numpy as jnp
        from jax import lax

        k = self.k
        cfgT, cfgD = self.target.cfg, self.draft.cfg
        tnet, tgraph = self.verify_net, self.verify_graph
        dnet, dgraph = self.draft.decode_net, self.draft.decode_graph
        d_logits_e = dgraph.outputs[0]
        t_logits_e = tgraph.outputs[0]
        d_att = [dgraph.nodes[f"dec_att_{i}"] for i in range(cfgD.layers)]
        t_att = [tgraph.nodes[f"ver_att_{i}"] for i in range(cfgT.layers)]

        def draft_step(d_params, tok, pos, caches):
            feed = {"input": tok.reshape(1, 1),
                    "pos": pos.reshape(1).astype(jnp.int32)}
            for i in range(cfgD.layers):
                feed[f"cache_k_{i}"] = caches[2 * i]
                feed[f"cache_v_{i}"] = caches[2 * i + 1]
            out = dnet.forward(d_params, feed)
            nxt = jnp.argmax(out[d_logits_e][0, 0]).astype(jnp.int32)
            new = []
            for i in range(cfgD.layers):
                new += [out[d_att[i].outputs[1]], out[d_att[i].outputs[2]]]
            return nxt, tuple(new)

        # params are EXPLICIT jit arguments: captured device arrays lower
        # as embedded module constants, and the serialized compile request
        # then exceeds the relay's size cap (the round-3 "HTTP 413" —
        # which was this bug, not a relay limit on program size)
        @jax.jit
        def round_step(t_params, d_params, cur, pos, t_caches, d_caches):
            def dstep(i, dc):
                tok, dpos, caches, drafts = dc
                nxt, caches = draft_step(d_params, tok, dpos, caches)
                return (nxt, dpos + 1, caches, drafts.at[i].set(nxt))

            _, _, d_caches2, drafts = lax.fori_loop(
                0, k, dstep, (cur, pos, d_caches,
                              jnp.zeros((k,), jnp.int32)))
            feed = {"input": jnp.concatenate([cur[None], drafts])
                    .reshape(1, k + 1),
                    "pos": pos.reshape(1).astype(jnp.int32)}
            for i in range(cfgT.layers):
                feed[f"cache_k_{i}"] = t_caches[2 * i]
                feed[f"cache_v_{i}"] = t_caches[2 * i + 1]
            out = tnet.forward(t_params, feed)
            nxt = jnp.argmax(out[t_logits_e][0], axis=-1).astype(jnp.int32)
            new_t = []
            for i in range(cfgT.layers):
                new_t += [out[t_att[i].outputs[1]], out[t_att[i].outputs[2]]]
            match = nxt[:k] == drafts
            a = jnp.argmin(jnp.concatenate(
                [match, jnp.array([False])]).astype(jnp.int32))
            padded = jnp.concatenate([drafts, jnp.zeros((1,), jnp.int32)])
            commit = jnp.where(jnp.arange(k + 1) == a, nxt[a], padded)
            return commit, a, tuple(new_t), d_caches2

        return round_step

    def _build_fused(self, P: int, N: int):
        import jax
        import jax.numpy as jnp
        from jax import lax

        k = self.k
        cfgT, cfgD = self.target.cfg, self.draft.cfg
        tnet, tgraph = self.verify_net, self.verify_graph
        dnet, dgraph = self.draft.decode_net, self.draft.decode_graph
        d_logits_e = dgraph.outputs[0]
        t_logits_e = tgraph.outputs[0]
        d_att = [dgraph.nodes[f"dec_att_{i}"] for i in range(cfgD.layers)]
        t_att = [tgraph.nodes[f"ver_att_{i}"] for i in range(cfgT.layers)]

        def draft_step(d_params, tok, pos, caches):
            feed = {"input": tok.reshape(1, 1),
                    "pos": pos.reshape(1).astype(jnp.int32)}
            for i in range(cfgD.layers):
                feed[f"cache_k_{i}"] = caches[2 * i]
                feed[f"cache_v_{i}"] = caches[2 * i + 1]
            out = dnet.forward(d_params, feed)
            nxt = jnp.argmax(out[d_logits_e][0, 0]).astype(jnp.int32)
            new = []
            for i in range(cfgD.layers):
                new += [out[d_att[i].outputs[1]], out[d_att[i].outputs[2]]]
            return nxt, tuple(new)

        def verify(t_params, tokens, pos, caches):
            feed = {"input": tokens.reshape(1, k + 1),
                    "pos": pos.reshape(1).astype(jnp.int32)}
            for i in range(cfgT.layers):
                feed[f"cache_k_{i}"] = caches[2 * i]
                feed[f"cache_v_{i}"] = caches[2 * i + 1]
            out = tnet.forward(t_params, feed)
            nxt = jnp.argmax(out[t_logits_e][0], axis=-1).astype(jnp.int32)
            new = []
            for i in range(cfgT.layers):
                new += [out[t_att[i].outputs[1]], out[t_att[i].outputs[2]]]
            return nxt, tuple(new)

        # params as explicit arguments — see _build_round (the 413 bug)
        @jax.jit
        def run(t_params, d_params, t0, t_caches, d_caches):
            buf0 = jnp.zeros((N + k + 1,), jnp.int32).at[0].set(t0)

            def cond(c):
                return c["ptr"] < N

            def body(c):
                def dstep(i, dc):
                    tok, dpos, caches, drafts = dc
                    nxt, caches = draft_step(d_params, tok, dpos, caches)
                    return (nxt, dpos + 1, caches, drafts.at[i].set(nxt))

                _, _, d_caches, drafts = lax.fori_loop(
                    0, k, dstep,
                    (c["cur"], c["pos"], c["d_caches"],
                     jnp.zeros((k,), jnp.int32)))
                chunk = jnp.concatenate([c["cur"][None], drafts])
                nxt, t_caches = verify(t_params, chunk, c["pos"],
                                       c["t_caches"])
                match = nxt[:k] == drafts                  # [k]
                a = jnp.argmin(jnp.concatenate(
                    [match, jnp.array([False])]).astype(jnp.int32))
                padded = jnp.concatenate([drafts,
                                          jnp.zeros((1,), jnp.int32)])
                commit = jnp.where(jnp.arange(k + 1) == a, nxt[a], padded)
                buf = lax.dynamic_update_slice(c["buf"], commit, (c["ptr"],))
                return dict(ptr=c["ptr"] + a + 1, pos=c["pos"] + a + 1,
                            cur=nxt[a], buf=buf, t_caches=t_caches,
                            d_caches=d_caches,
                            rounds=c["rounds"] + 1,
                            accepted=c["accepted"] + a)

            init = dict(ptr=jnp.int32(1), pos=jnp.int32(P), cur=t0,
                        buf=buf0, t_caches=t_caches, d_caches=d_caches,
                        rounds=jnp.int32(0), accepted=jnp.int32(0))
            c = lax.while_loop(cond, body, init)
            return c["buf"][:N], c["rounds"], c["accepted"]

        return run
