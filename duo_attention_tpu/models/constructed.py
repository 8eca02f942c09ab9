"""Hand-constructed retrieval model: an exact induction circuit in Llama form.

The accuracy loop (evals/accuracy_loop.py) needs a model that SOLVES the
passkey task with full attention. VERDICT r1 allows "pretrain (or
directly construct)" — and controlled experiments in this environment
showed gradient descent does not discover content-based induction within
budget (fixed-offset copying converges in ~400 steps, but any
variable-offset variant stays at the entropy floor: the model keeps
finding positional shortcuts). So this module WRITES the circuit into
the weights of this repo's own Llama architecture (RMSNorm + RoPE + GQA
+ SwiGLU, models/llama.py) — no architectural changes, every framework
path (engine, kernels, gate trainer) runs it like any checkpoint.

The circuit (2 layers, 4 heads each, head_dim 64):

  layer 0, head 0   previous-token head (offset 1): bias-only q/k whose
                    RoPE phases form a kernel peaked at j = i-1; copies
                    the match-signature of token_{i-1} into subspace B1.
  layer 0, head 1   offset-2 head -> subspace B2.
  layer 1, head 0   bigram induction head: matches ("{name}", "is")
                    against (B2_j, B1_j) in rotation-slow dims, reads the
                    output-signature of token_j into subspace C — fires
                    exactly at the first passkey word.
  layer 1, head 1   unigram continuation head: matches token_i == code
                    word token_{j-1}; chains w2, w3 and the final ".".
  all other heads   zero (streaming-compatible by construction).

Head-type ground truth: layer-1 heads {0,1} are retrieval heads (their
keys live arbitrarily deep in the context); layer-0 heads are strictly
local (offsets 1-2 << recent window) — the exact structure DuoAttention
gates are meant to discover, so the gate trainer can be validated against
a KNOWN answer.

Signature spaces (hidden 256 = 4 x 64-dim subspaces A|B1|B2|C):
  match signatures: orthonormal basis over {20 names, 26 code words,
  "is"}; placed in the rotation-slow RoPE pairs so matching is
  position-invariant over the spec's range. output signatures:
  orthonormal basis over {26 code words, "."} in C, read by the lm_head.

Two specs (scripts/design_long_circuit.py is the design/validation tool):

  BASE_SPEC  theta 1e8, range 32k: match pairs 16..31 (pair 16 drifts
             1e-4 rad/token — score retention ~0.73 at a 32k separation,
             the measured edge of this variant), positional kernel on 8
             fast pairs with margin 0.13 over D in [0, 4096].
  LONG_SPEC  theta 1e14, range 4.2M (past the reference's 3.3M demo,
             demo/run_duo_w8a8kv4.py:83-206): match pairs 16..31 — the
             worst pair drifts 0.42 rad over 4.2M (average-energy
             retention 0.99, worst single-pair-concentrated code 0.91,
             vs the 30-nat sink at lambda_match 40); positional kernel
             on the 15 pairs that still vary over 4.2M, LP-optimized min
             margin 0.1656 over the WHOLE range (softmax noise mass
             <= 1e-5 at lambda_pos 100 under INT4-KV score noise).
             Requires rope_precise (f32 phase error alone is ~0.5 rad
             at 4M).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import numpy as np

from ..config import ModelConfig
from ..evals import niah as _niah  # noqa: F401 (word lists live next door)
from ..train.data import _CODE_WORDS, _NAMES

E = 256
D = 64  # head_dim
NH = 4  # heads per layer (MHA)

# subspace slices of the residual stream
A = slice(0, 64)    # current-token match signature (embedding)
B1 = slice(64, 128)   # token_{i-1} signature (layer-0 head 0)
B2 = slice(128, 192)  # token_{i-2} signature (layer-0 head 1)
C = slice(192, 256)   # copied-output signature (layer-1 heads)

# Attention outputs write at 1/16 so every residual subspace carries
# ~unit magnitude (RMSNorm emits 16x-unit components for a 1-subspace
# residual). Unbalanced subspaces break GATE TRAINING, not inference:
# with B1/B2 at 16x, the retrieval-bearing C subspace is 0.05% of the
# distill MSE and the L1 regularizer drives every gate to zero
# (measured); balanced, C is ~10% of the loss and the gates separate.
W_OUT_SCALE = 1.0 / 16.0
EXPECTED_KEY_NORM = 16.0 / np.sqrt(3.0)  # per-unit component post-norm


def _legacy_amps() -> Tuple[float, ...]:
    amps = np.linspace(2.0, 0.5, 8)  # fast-weighted: best measured
    return tuple(amps / amps.sum())  # gap 0.13 over Delta in 0..4096


@dataclasses.dataclass(frozen=True)
class CircuitSpec:
    """Position-range design of the circuit (see module docstring)."""

    rope_theta: float = 1e8
    max_position_embeddings: int = 32768
    rope_precise: bool = False
    # rotation pairs carrying the match codes (slowest pairs)
    match_pairs: Tuple[int, ...] = tuple(range(16, 32))
    # positional-kernel amplitudes over pairs 0..len-1 (sum to 1)
    pos_amps: Tuple[float, ...] = dataclasses.field(
        default_factory=_legacy_amps
    )
    lambda_match: float = 40.0  # pre-softmax score scale for exact match
    lambda_pos: float = 100.0   # positional kernel score scale
    lambda_out: float = 25.0    # lm_head logit scale
    # BOS-sink score for the induction heads: when nothing matches, all
    # attention parks on BOS (whose value is zero) instead of spreading
    # uniformly — uniform spread averages many "."-position values into C
    # and drowns the real signal (measured: logit 22.6 for "." vs 17.7
    # for the retrieved word). Far above noise (0), far below a match.
    lambda_sink: float = 30.0

    @property
    def code_dim(self) -> int:
        return 2 * len(self.match_pairs)

    def model_config(self) -> ModelConfig:
        return ModelConfig(
            vocab_size=512,
            hidden_size=E,
            intermediate_size=64,
            num_layers=2,
            num_heads=NH,
            num_kv_heads=NH,
            head_dim=D,
            rope_theta=self.rope_theta,
            rope_precise=self.rope_precise,
            max_position_embeddings=self.max_position_embeddings,
            attention_bias=True,
        )


BASE_SPEC = CircuitSpec()

# LP-optimized over every integer separation in [0, 4194304] — the same
# amps are minimax-optimal for both offsets (design_long_circuit.py):
# min margin 0.1656 (at D=57951 / D=754675), noise mass 1.2e-5 at
# lambda_pos=100 under 0.02-kernel-unit INT4 score noise.
_LONG_AMPS = (
    0.34704, 0.08182, 0.06386, 0.06070, 0.06519, 0.06706, 0.04986,
    0.05106, 0.03195, 0.03456, 0.04633, 0.02584, 0.01885, 0.02718,
    0.02870,
)

LONG_SPEC = CircuitSpec(
    rope_theta=1e14,
    max_position_embeddings=4_194_304,
    rope_precise=True,
    # all 16 slow pairs: at theta=1e14 even pair 16 drifts only 0.42 rad
    # over 4.2M (avg retention >= 0.99, worst single-pair-concentrated
    # code 0.91 -> matched 36.5 nats, still > the 30-nat sink). The
    # 14-pair (28-dim) variant measurably loses decode margin under
    # stacked W8A8+INT4-KV noise (codes carry 14% more per-dim energy),
    # flipping ~1/8 retrievals at 2k ctx; 32-dim codes do not.
    match_pairs=tuple(range(16, 32)),
    pos_amps=_LONG_AMPS,
)

CONSTRUCTED_LM = BASE_SPEC.model_config()
CONSTRUCTED_LM_LONG = LONG_SPEC.model_config()

SPECS = {"constructed": BASE_SPEC, "constructed-long": LONG_SPEC}


def spec_for(model_name: str) -> CircuitSpec:
    """CLI-name -> spec ('constructed' | 'constructed-long')."""
    return SPECS[model_name]


def _inv_freq(spec: CircuitSpec) -> np.ndarray:
    return 1.0 / (
        spec.rope_theta ** (np.arange(0, D, 2, dtype=np.float64) / D)
    )


def _positional_qk(offset: int, spec: CircuitSpec) -> Tuple[np.ndarray, np.ndarray]:
    """Bias vectors whose post-RoPE score peaks exactly at j = i - offset.

    Per rotation pair p: q_p = (a, 0), k_p = R(w_p * offset)(a, 0), so
    score(i, j) = sum_p a^2 cos(w_p (j - i + offset)) — a Dirichlet-style
    kernel with its maximum at j = i - offset. Fast pairs only (slow pairs
    stay zero for the matching heads to use)."""
    w = _inv_freq(spec)
    bq = np.zeros(D)
    bk = np.zeros(D)
    for p, amp in enumerate(spec.pos_amps):
        bq[p] = amp
        bk[p] = np.cos(w[p] * offset)
        bk[p + D // 2] = np.sin(w[p] * offset)
    return bq, bk


def _orthonormal_rows(n: int, dim: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    m = rng.standard_normal((dim, dim))
    q, _ = np.linalg.qr(m)
    assert n <= dim
    return q[:n]


class Signatures:
    """Token-id keyed signature tables for a given tokenizer.

    Residual-stream match signatures are orthonormal in the FULL 64-dim
    subspaces (47 tokens <= 64 dims); each induction head projects just
    the token subset it matches on (names+is: 21, codes: 26) into its own
    code_dim rotation-slow q/k dims."""

    def __init__(self, tokenizer):
        enc = lambda w: tokenizer.encode(" " + w, add_bos=False)  # noqa: E731
        self.name_ids = [self._one(enc, w) for w in _NAMES]
        self.code_ids = [self._one(enc, w) for w in _CODE_WORDS]
        self.is_id = self._one(enc, "is")
        self.dot_id = tokenizer.encode(".", add_bos=False)[-1]

        ids = self.name_ids + self.code_ids + [self.is_id]
        assert len(set(ids)) == len(ids), "token-id collision in vocab"
        basis = _orthonormal_rows(len(ids) + 1, 64, seed=0)
        self.match = {tid: basis[i] for i, tid in enumerate(ids)}
        # BOS flag (orthogonal to every match signature): the induction
        # heads' no-match attention sink
        self.bos_sig = basis[len(ids)]
        # C's last two dims are embedding hooks (const + "."), so output
        # signatures live in its first 62 dims
        ob = _orthonormal_rows(len(self.code_ids) + 1, 62, seed=1)
        out_basis = np.pad(ob, ((0, 0), (0, 2)))
        self.out = {tid: out_basis[i] for i, tid in enumerate(self.code_ids)}
        self.out[self.dot_id] = out_basis[-1]

    @staticmethod
    def _one(enc, w):
        ids = enc(w)
        assert len(ids) == 1, (w, ids)
        return ids[0]


def slow_embed(sig: np.ndarray, spec: CircuitSpec) -> np.ndarray:
    """Place a code_dim code on the spec's slow pairs of a 64-dim head
    (first components = the pairs' cos dims, second = their sin dims)."""
    pairs = np.asarray(spec.match_pairs)
    n = len(pairs)
    v = np.zeros(D)
    v[pairs] = sig[:n]
    v[pairs + D // 2] = sig[n:]
    return v


def build_params(tokenizer, dtype=np.float32,
                 spec: CircuitSpec = BASE_SPEC) -> Dict:
    """Construct the full param pytree (numpy; callers jnp-ify)."""
    sig = Signatures(tokenizer)
    cfg = spec.model_config()
    V = cfg.vocab_size
    const_dim = C.start + 62  # embedding hooks parked in C's spare dims
    dot_dim = C.start + 63    # (C is empty until layer 1 writes it)

    # ---- embedding: match signature of known tokens into subspace A ----
    embed = np.zeros((V, E))
    for tid, s in sig.match.items():
        embed[tid, A] = s
    embed[1, A] = sig.bos_sig  # BOS (ByteTokenizer/WordTokenizer id 1)
    # give every token a small constant component outside the signature
    # dims so no position has an all-zero residual (RMSNorm stability)
    embed[:, const_dim] += 0.05
    embed[sig.dot_id, dot_dim] = 1.0  # the "." output hook

    def zeros_layer():
        return {
            "input_norm": np.ones(E),
            "post_norm": np.ones(E),
            "wq": np.zeros((E, NH * D)),
            "wk": np.zeros((E, NH * D)),
            "wv": np.zeros((E, NH * D)),
            "wo": np.zeros((NH * D, E)),
            "bq": np.zeros(NH * D),
            "bk": np.zeros(NH * D),
            "bv": np.zeros(NH * D),
            "w_gate": np.zeros((E, cfg.intermediate_size)),
            "w_up": np.zeros((E, cfg.intermediate_size)),
            "w_down": np.zeros((cfg.intermediate_size, E)),
        }

    # ---- layer 0: previous-token heads (offsets 1 and 2) ----
    l0 = zeros_layer()
    for head, (offset, dst) in enumerate([(1, B1), (2, B2)]):
        bq, bk = _positional_qk(offset, spec)
        scale = spec.lambda_pos * np.sqrt(D)  # undo 1/sqrt(D) in attention
        l0["bq"][head * D : (head + 1) * D] = bq * scale
        l0["bk"][head * D : (head + 1) * D] = bk
        # v: read the A-subspace signature of the attended token
        l0["wv"][A, head * D : (head + 1) * D] = np.eye(64)
        # o: write it into the destination subspace (rebalanced)
        l0["wo"][head * D : (head + 1) * D, dst] = np.eye(64) * W_OUT_SCALE

    # ---- layer 1: induction heads ----
    l1 = zeros_layer()
    s = spec.lambda_match * np.sqrt(D)
    cdim = spec.code_dim

    def put_match(mat_eD, src_slice, sig64_rows, code_rows, weight):
        """mat[src-subspace signature -> code_dim slow code of the head]."""
        for r in range(sig64_rows.shape[0]):
            src = np.zeros(E)
            src[src_slice] = sig64_rows[r]
            mat_eD += np.outer(src, slow_embed(code_rows[r], spec)) * weight
        return mat_eD

    # head 0 — bigram ({name}, "is"): q = [is?(token_i) from A,
    # name-sig(token_{i-1}) from B1]; k = [is?(B1_j), name-sig(B2_j)]
    is_name_sigs = np.stack(
        [sig.match[sig.is_id]] + [sig.match[t] for t in sig.name_ids]
    )  # [21, 64]
    codes0 = _orthonormal_rows(len(is_name_sigs) + 1, cdim, seed=2)
    q0 = put_match(np.zeros((E, D)), A, is_name_sigs[:1], codes0[:1], s)
    q0 = put_match(q0, B1, is_name_sigs[1:21], codes0[1:21], s)
    k0 = put_match(np.zeros((E, D)), B1, is_name_sigs[:1], codes0[:1], 1.0)
    k0 = put_match(k0, B2, is_name_sigs[1:21], codes0[1:21], 1.0)
    # BOS sink: constant query component (bias) meets the BOS key. Keyed
    # off B1 (layer-0 self-attention at position 0 copies bos_sig there
    # with ~16x magnitude) — keying off A fails because RMSNorm shrinks
    # BOS's raw embedding to ~0.7 once B1/B2 fill up (measured).
    k0 = put_match(k0, B1, sig.bos_sig[None], codes0[-1:], 1.0)
    l1["wq"][:, 0:D] = q0
    l1["wk"][:, 0:D] = k0
    l1["bq"][0:D] = slow_embed(codes0[-1], spec) * (
        spec.lambda_sink * np.sqrt(D) / EXPECTED_KEY_NORM
    )

    # head 1 — unigram code continuation: q = code-sig(token_i) from A,
    # k = code-sig(B1_j)
    code_sigs = np.stack([sig.match[t] for t in sig.code_ids])  # [26, 64]
    codes1 = _orthonormal_rows(len(code_sigs) + 1, cdim, seed=3)
    q1 = put_match(np.zeros((E, D)), A, code_sigs, codes1[:-1], s)
    k1 = put_match(np.zeros((E, D)), B1, code_sigs, codes1[:-1], 1.0)
    k1 = put_match(k1, B1, sig.bos_sig[None], codes1[-1:], 1.0)
    l1["wq"][:, D : 2 * D] = q1
    l1["wk"][:, D : 2 * D] = k1
    l1["bq"][D : 2 * D] = slow_embed(codes1[-1], spec) * (
        spec.lambda_sink * np.sqrt(D) / EXPECTED_KEY_NORM
    )

    # both heads: v reads the OUTPUT signature of token_j (translating
    # A's match signature / the "." hook), o writes into C
    v_read = np.zeros((E, D))
    for tid in sig.code_ids:
        src = np.zeros(E)
        src[A] = sig.match[tid]
        v_read += np.outer(src, sig.out[tid])
    dot_src = np.zeros(E)
    dot_src[dot_dim] = 1.0
    v_read += np.outer(dot_src, sig.out[sig.dot_id])
    for head in (0, 1):
        l1["wv"][:, head * D : (head + 1) * D] = v_read
        l1["wo"][head * D : (head + 1) * D, C] = np.eye(64) * W_OUT_SCALE

    # ---- lm_head: read C with the output signatures ----
    lm_head = np.zeros((E, V))
    for tid, o in sig.out.items():
        lm_head[C, tid] = o * spec.lambda_out

    params = {
        "embed": embed.astype(dtype),
        "final_norm": np.ones(E, dtype=dtype),
        "lm_head": lm_head.astype(dtype),
        "layers": tuple(
            {k: np.asarray(v, dtype) for k, v in l.items()} for l in (l0, l1)
        ),
    }
    import jax.numpy as jnp

    return {
        "embed": jnp.asarray(params["embed"]),
        "final_norm": jnp.asarray(params["final_norm"]),
        "lm_head": jnp.asarray(params["lm_head"]),
        "layers": tuple(
            {k: jnp.asarray(v) for k, v in l.items()} for l in params["layers"]
        ),
    }
