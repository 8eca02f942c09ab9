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

Three specs (scripts/design_long_circuit.py is the design/validation tool):

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
  LONG_8B_SPEC  the LONG_SPEC circuit grafted into the FULL Llama-3-8B
             geometry (32 layers / 4096 hidden / 32 q + 8 kv heads /
             head_dim 128 / vocab 128256 — config.LLAMA3_8B_1048K's
             shapes): the circuit occupies layers 0-1, the other 30
             layers are exact residual pass-throughs (zero attention +
             MLP output), so the whole 8B-scale serving stack — W8A8
             GEMMs, INT4 KV, chunked prefill, decode kernels — runs at
             flagship cost while retrieval accuracy is attested by the
             SAME model (reference analog: the real-checkpoint 3.3M demo,
             demo/run_duo_w8a8kv4.py:83-206). Grafting preserves the
             validated E=256 score calibration exactly: all RMSNorm
             weight vectors are scaled by sqrt(256/E) so post-norm
             activations match the 2-layer circuit's, and the positional
             kernel reuses LONG_SPEC's LP-optimal amplitudes on the even
             pairs of the 128-dim head (identical frequencies:
             theta^(-2p/128) at p=2k equals theta^(-k/32) at D=64).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import numpy as np

from ..config import ModelConfig
from ..evals import niah as _niah  # noqa: F401 (word lists live next door)
from ..train.data import _CODE_WORDS, _NAMES

E = 256   # hidden size the circuit math is calibrated at (see norm trick)
D = 64    # head_dim of the minimal carrier
NH = 4    # heads per layer of the minimal carrier (MHA)

# subspace slices of the residual stream
A = slice(0, 64)    # current-token match signature (embedding)
B1 = slice(64, 128)   # token_{i-1} signature (layer-0 head 0)
B2 = slice(128, 192)  # token_{i-2} signature (layer-0 head 1)
C = slice(192, 256)   # copied-output signature (layer-1 heads)

# Attention outputs write at 1/16 so every residual subspace carries
# ~unit magnitude (RMSNorm emits 16x-unit components for a 1-subspace
# residual at E=256). Unbalanced subspaces break GATE TRAINING, not
# inference: with B1/B2 at 16x, the retrieval-bearing C subspace is 0.05%
# of the distill MSE and the L1 regularizer drives every gate to zero
# (measured); balanced, C is ~10% of the loss and the gates separate.
#
# Hosts wider than E=256 keep these calibrations VERBATIM via the norm
# trick: every RMSNorm weight vector is uniformly sqrt(256/E_host), which
# makes post-norm activations identical to the E=256 circuit's (RMS over
# E_host dims of the same 256-dim content is sqrt(256/E_host) smaller).
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
    # positional-kernel amplitudes (sum to 1), placed on ``pos_pairs``
    # (None -> the first len(pos_amps) pairs — the legacy layout)
    pos_amps: Tuple[float, ...] = dataclasses.field(
        default_factory=_legacy_amps
    )
    pos_pairs: Optional[Tuple[int, ...]] = None
    lambda_match: float = 40.0  # pre-softmax score scale for exact match
    lambda_pos: float = 100.0   # positional kernel score scale
    lambda_out: float = 25.0    # lm_head logit scale
    # BOS-sink score for the induction heads: when nothing matches, all
    # attention parks on BOS (whose value is zero) instead of spreading
    # uniformly — uniform spread averages many "."-position values into C
    # and drowns the real signal (measured: logit 22.6 for "." vs 17.7
    # for the retrieved word). Far above noise (0), far below a match.
    lambda_sink: float = 30.0
    # ---- host geometry the circuit is written into (defaults = the
    # minimal 2-layer carrier; LONG_8B_SPEC = the full 8B geometry) ----
    hidden_size: int = E
    head_dim: int = D
    num_layers: int = 2
    num_heads: int = NH
    num_kv_heads: int = NH
    intermediate_size: int = 64
    vocab_size: int = 512
    # the two layers hosting the circuit: (local-heads layer, induction
    # layer); every other host layer is an exact residual pass-through
    circuit_layers: Tuple[int, int] = (0, 1)
    # Opt-in digit vocabulary "1".."{num_digits}": digits become
    # retrievable/emittable like code words, making the LongBench
    # retrieval_score family ("Paragraph N" answers) expressible in the
    # grammar. Costs signature rows (names 20 + codes 26 + is + digits
    # + BOS <= 64) and continuation-code rows (26 + digits + 1 <=
    # code_dim) — so it needs the 64-dim codes of a head_dim-128 spec;
    # 0 keeps the original circuits bit-identical.
    num_digits: int = 0

    @property
    def code_dim(self) -> int:
        return 2 * len(self.match_pairs)

    @property
    def positional_pairs(self) -> Tuple[int, ...]:
        return (self.pos_pairs if self.pos_pairs is not None
                else tuple(range(len(self.pos_amps))))

    @property
    def norm_scale(self) -> float:
        """Uniform RMSNorm weight keeping post-norm activations identical
        to the calibrated E=256 circuit (see W_OUT_SCALE comment)."""
        return float(np.sqrt(E / self.hidden_size))

    def model_config(self) -> ModelConfig:
        return ModelConfig(
            vocab_size=self.vocab_size,
            hidden_size=self.hidden_size,
            intermediate_size=self.intermediate_size,
            num_layers=self.num_layers,
            num_heads=self.num_heads,
            num_kv_heads=self.num_kv_heads,
            head_dim=self.head_dim,
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

LONG_8B_SPEC = CircuitSpec(
    rope_theta=1e14,
    max_position_embeddings=4_194_304,
    rope_precise=True,
    # The 32 slow pairs of the 128-dim head: inv_freq[p] = theta^(-p/64),
    # so p >= 32 drifts <= theta^(-1/2) * 4.2e6 = 0.42 rad over the 4.2M
    # design range — the same worst-pair drift LONG_SPEC's pair 16 has at
    # D=64. 32 pairs -> 64-dim match codes (even more per-dim margin
    # under stacked W8A8+INT4 noise than LONG_SPEC's validated 32 dims).
    match_pairs=tuple(range(32, 64)),
    # Even pairs 0,2,..,28 of the 128-dim head have EXACTLY the
    # frequencies of LONG_SPEC's pairs 0..14 (theta^(-2k/128) =
    # theta^(-k/32)), so the LP-minimax amplitudes carry over verbatim
    # with the same 0.1656 margin over every separation in [0, 4.2M].
    pos_amps=_LONG_AMPS,
    pos_pairs=tuple(range(0, 30, 2)),
    # full Llama-3-8B geometry (config.LLAMA3_8B_1048K shapes)
    hidden_size=4096,
    head_dim=128,
    num_layers=32,
    num_heads=32,
    num_kv_heads=8,
    intermediate_size=14336,
    vocab_size=128256,
    # digits "1".."16" are emittable (LongBench retrieval_score family);
    # fits: 64-dim codes (32 match pairs), 63+BOS signature rows
    num_digits=16,
)

CONSTRUCTED_LM = BASE_SPEC.model_config()
CONSTRUCTED_LM_LONG = LONG_SPEC.model_config()

# CPU-sized twin of LONG_8B_SPEC's novel structure (wide host + norm
# trick, head_dim 128, GQA query-slot mapping, pass-through layers,
# digit vocabulary) — exercises every 8B-graft mechanism in seconds.
SMALL_D128_SPEC = CircuitSpec(
    rope_theta=1e14,
    max_position_embeddings=4_194_304,
    rope_precise=True,
    match_pairs=tuple(range(32, 64)),
    pos_amps=_LONG_AMPS,
    pos_pairs=tuple(range(0, 30, 2)),
    hidden_size=512,
    head_dim=128,
    num_layers=4,
    num_heads=8,
    num_kv_heads=4,
    intermediate_size=128,
    vocab_size=512,
    circuit_layers=(1, 2),
    num_digits=16,
)

SPECS = {
    "constructed": BASE_SPEC,
    "constructed-long": LONG_SPEC,
    "constructed-8b": LONG_8B_SPEC,
    "constructed-d128": SMALL_D128_SPEC,
}


def ground_truth_heads(spec: CircuitSpec = BASE_SPEC) -> np.ndarray:
    """[num_layers, num_kv_heads] gate matrix of the KNOWN head types:
    the induction layer's two circuit KV heads are retrieval (1.0),
    everything else is streaming (0.0)."""
    heads = np.zeros((spec.num_layers, spec.num_kv_heads))
    heads[spec.circuit_layers[1], 0:2] = 1.0
    return heads


def spec_for(model_name: str) -> CircuitSpec:
    """CLI-name -> spec ('constructed' | 'constructed-long')."""
    return SPECS[model_name]


def _inv_freq(spec: CircuitSpec) -> np.ndarray:
    Dh = spec.head_dim
    return 1.0 / (
        spec.rope_theta ** (np.arange(0, Dh, 2, dtype=np.float64) / Dh)
    )


def _positional_qk(offset: int, spec: CircuitSpec) -> Tuple[np.ndarray, np.ndarray]:
    """Bias vectors whose post-RoPE score peaks exactly at j = i - offset.

    Per rotation pair p: q_p = (a, 0), k_p = R(w_p * offset)(a, 0), so
    score(i, j) = sum_p a^2 cos(w_p (j - i + offset)) — a Dirichlet-style
    kernel with its maximum at j = i - offset. Fast pairs only (slow pairs
    stay zero for the matching heads to use)."""
    w = _inv_freq(spec)
    Dh = spec.head_dim
    bq = np.zeros(Dh)
    bk = np.zeros(Dh)
    for p, amp in zip(spec.positional_pairs, spec.pos_amps):
        bq[p] = amp
        bk[p] = np.cos(w[p] * offset)
        bk[p + Dh // 2] = np.sin(w[p] * offset)
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
    subspaces (47 tokens + up to 16 digits <= 64 dims); each induction
    head projects just the token subset it matches on (names+is: 21,
    codes [+digits]: 26+) into its own code_dim rotation-slow q/k dims.

    ``num_digits`` > 0 appends digit tokens "1".."N" as extra emittable
    code tokens (see CircuitSpec.num_digits). Digit rows are APPENDED to
    every basis, so the original 47 token signatures are unchanged; only
    the BOS row index moves (no committed artifact depends on it at
    num_digits > 0 — the 0 default is bit-identical to before)."""

    def __init__(self, tokenizer, num_digits: int = 0):
        enc = lambda w: tokenizer.encode(" " + w, add_bos=False)  # noqa: E731
        self.name_ids = [self._one(enc, w) for w in _NAMES]
        self.code_ids = [self._one(enc, w) for w in _CODE_WORDS]
        self.is_id = self._one(enc, "is")
        self.dot_id = tokenizer.encode(".", add_bos=False)[-1]
        self.digit_ids = [
            self._one(enc, str(d)) for d in range(1, num_digits + 1)
        ]
        # digits behave exactly like code words downstream (retrieved by
        # the bigram head, chained by the continuation head)
        self.emit_ids = self.code_ids + self.digit_ids

        ids = self.name_ids + self.code_ids + [self.is_id] + self.digit_ids
        assert len(set(ids)) == len(ids), "token-id collision in vocab"
        assert len(ids) + 1 <= 64, "signature basis exceeds the A subspace"
        basis = _orthonormal_rows(len(ids) + 1, 64, seed=0)
        self.match = {tid: basis[i] for i, tid in enumerate(ids)}
        # BOS flag (orthogonal to every match signature): the induction
        # heads' no-match attention sink
        self.bos_sig = basis[len(ids)]
        # C's last two dims are embedding hooks (const + "."), so output
        # signatures live in its first 62 dims
        ob = _orthonormal_rows(len(self.emit_ids) + 1, 62, seed=1)
        out_basis = np.pad(ob, ((0, 0), (0, 2)))
        self.out = {tid: out_basis[i] for i, tid in enumerate(self.emit_ids)}
        self.out[self.dot_id] = out_basis[-1]

    @staticmethod
    def _one(enc, w):
        ids = enc(w)
        assert len(ids) == 1, (w, ids)
        return ids[0]


def slow_embed(sig: np.ndarray, spec: CircuitSpec) -> np.ndarray:
    """Place a code_dim code on the spec's slow pairs of a head_dim head
    (first components = the pairs' cos dims, second = their sin dims)."""
    pairs = np.asarray(spec.match_pairs)
    n = len(pairs)
    v = np.zeros(spec.head_dim)
    v[pairs] = sig[:n]
    v[pairs + spec.head_dim // 2] = sig[n:]
    return v


def _build_embed_np(sig: Signatures, spec: CircuitSpec) -> np.ndarray:
    """Embedding: match signature of known tokens into subspace A."""
    Eh = spec.hidden_size
    const_dim = C.start + 62  # embedding hooks parked in C's spare dims
    dot_dim = C.start + 63    # (C is empty until layer 1 writes it)
    embed = np.zeros((spec.vocab_size, Eh), np.float32)
    for tid, s in sig.match.items():
        embed[tid, A] = s
    embed[1, A] = sig.bos_sig  # BOS (ByteTokenizer/WordTokenizer id 1)
    # give every token a small constant component outside the signature
    # dims so no position has an all-zero residual (RMSNorm stability)
    embed[:, const_dim] += 0.05
    embed[sig.dot_id, dot_dim] = 1.0  # the "." output hook
    return embed


def _build_lm_head_np(sig: Signatures, spec: CircuitSpec) -> np.ndarray:
    """lm_head: read C with the output signatures."""
    lm_head = np.zeros((spec.hidden_size, spec.vocab_size), np.float32)
    for tid, o in sig.out.items():
        lm_head[C, tid] = o * spec.lambda_out
    return lm_head


def _zeros_layer_np(spec: CircuitSpec) -> Dict:
    """Host-shaped all-zero layer: with zero attention-output and MLP
    weights the layer is an EXACT residual pass-through — the engine
    still runs its full-cost GEMMs/attention/KV like any real layer."""
    Eh, Dh = spec.hidden_size, spec.head_dim
    Hq, Hkv = spec.num_heads, spec.num_kv_heads
    norm = np.full(Eh, spec.norm_scale, np.float32)
    return {
        "input_norm": norm.copy(),
        "post_norm": norm.copy(),
        "wq": np.zeros((Eh, Hq * Dh), np.float32),
        "wk": np.zeros((Eh, Hkv * Dh), np.float32),
        "wv": np.zeros((Eh, Hkv * Dh), np.float32),
        "wo": np.zeros((Hq * Dh, Eh), np.float32),
        "bq": np.zeros(Hq * Dh, np.float32),
        "bk": np.zeros(Hkv * Dh, np.float32),
        "bv": np.zeros(Hkv * Dh, np.float32),
        "w_gate": np.zeros((Eh, spec.intermediate_size), np.float32),
        "w_up": np.zeros((Eh, spec.intermediate_size), np.float32),
        "w_down": np.zeros((spec.intermediate_size, Eh), np.float32),
    }


def _build_circuit_layers_np(
    sig: Signatures, spec: CircuitSpec
) -> Tuple[Dict, Dict]:
    """The two functional layers (local heads, induction heads), numpy.

    Under GQA the two functional heads per layer use QUERY slots 0 and G
    (G = query heads per KV head) so they map onto KV heads 0 and 1; the
    other query heads of those groups keep zero output weights (their
    attention patterns are computed but contribute nothing)."""
    Eh, Dh = spec.hidden_size, spec.head_dim
    G = spec.num_heads // spec.num_kv_heads
    dot_dim = C.start + 63

    def qslot(fn_idx):  # query-channel slice of functional head fn_idx
        h = fn_idx * G
        return slice(h * Dh, (h + 1) * Dh)

    def kvslot(fn_idx):
        return slice(fn_idx * Dh, (fn_idx + 1) * Dh)

    # values are 64-dim signatures; they ride in the first 64 dims of the
    # (possibly wider) value head — v is not rotated, so any fixed dims do
    def qv64(fn_idx):
        h = fn_idx * G
        return slice(h * Dh, h * Dh + 64)

    def kv64(fn_idx):
        return slice(fn_idx * Dh, fn_idx * Dh + 64)

    # ---- local layer: previous-token heads (offsets 1 and 2) ----
    l0 = _zeros_layer_np(spec)
    for head, (offset, dst) in enumerate([(1, B1), (2, B2)]):
        bq, bk = _positional_qk(offset, spec)
        scale = spec.lambda_pos * np.sqrt(Dh)  # undo 1/sqrt(D) in attention
        l0["bq"][qslot(head)] = bq * scale
        l0["bk"][kvslot(head)] = bk
        # v: read the A-subspace signature of the attended token
        l0["wv"][A, kv64(head)] = np.eye(64)
        # o: write it into the destination subspace (rebalanced)
        l0["wo"][qv64(head), dst] = np.eye(64) * W_OUT_SCALE

    # ---- induction layer ----
    l1 = _zeros_layer_np(spec)
    s = spec.lambda_match * np.sqrt(Dh)
    cdim = spec.code_dim

    def put_match(mat_eD, src_slice, sig64_rows, code_rows, weight):
        """mat[src-subspace signature -> code_dim slow code of the head]."""
        for r in range(sig64_rows.shape[0]):
            src = np.zeros(Eh)
            src[src_slice] = sig64_rows[r]
            mat_eD += np.outer(src, slow_embed(code_rows[r], spec)) * weight
        return mat_eD

    # head 0 — bigram ({name}, "is"): q = [is?(token_i) from A,
    # name-sig(token_{i-1}) from B1]; k = [is?(B1_j), name-sig(B2_j)]
    is_name_sigs = np.stack(
        [sig.match[sig.is_id]] + [sig.match[t] for t in sig.name_ids]
    )  # [21, 64]
    codes0 = _orthonormal_rows(len(is_name_sigs) + 1, cdim, seed=2)
    q0 = put_match(np.zeros((Eh, Dh)), A, is_name_sigs[:1], codes0[:1], s)
    q0 = put_match(q0, B1, is_name_sigs[1:21], codes0[1:21], s)
    k0 = put_match(np.zeros((Eh, Dh)), B1, is_name_sigs[:1], codes0[:1], 1.0)
    k0 = put_match(k0, B2, is_name_sigs[1:21], codes0[1:21], 1.0)
    # BOS sink: constant query component (bias) meets the BOS key. Keyed
    # off B1 (layer-0 self-attention at position 0 copies bos_sig there
    # with ~16x magnitude) — keying off A fails because RMSNorm shrinks
    # BOS's raw embedding to ~0.7 once B1/B2 fill up (measured).
    k0 = put_match(k0, B1, sig.bos_sig[None], codes0[-1:], 1.0)
    l1["wq"][:, qslot(0)] = q0
    l1["wk"][:, kvslot(0)] = k0
    l1["bq"][qslot(0)] = slow_embed(codes0[-1], spec) * (
        spec.lambda_sink * np.sqrt(Dh) / EXPECTED_KEY_NORM
    )

    # head 1 — unigram code continuation: q = code-sig(token_i) from A,
    # k = code-sig(B1_j); covers digits too when the spec enables them
    code_sigs = np.stack([sig.match[t] for t in sig.emit_ids])
    codes1 = _orthonormal_rows(len(code_sigs) + 1, cdim, seed=3)
    q1 = put_match(np.zeros((Eh, Dh)), A, code_sigs, codes1[:-1], s)
    k1 = put_match(np.zeros((Eh, Dh)), B1, code_sigs, codes1[:-1], 1.0)
    k1 = put_match(k1, B1, sig.bos_sig[None], codes1[-1:], 1.0)
    l1["wq"][:, qslot(1)] = q1
    l1["wk"][:, kvslot(1)] = k1
    l1["bq"][qslot(1)] = slow_embed(codes1[-1], spec) * (
        spec.lambda_sink * np.sqrt(Dh) / EXPECTED_KEY_NORM
    )

    # both heads: v reads the OUTPUT signature of token_j (translating
    # A's match signature / the "." hook), o writes into C
    v_read = np.zeros((Eh, 64))
    for tid in sig.emit_ids:
        src = np.zeros(Eh)
        src[A] = sig.match[tid]
        v_read += np.outer(src, sig.out[tid])
    dot_src = np.zeros(Eh)
    dot_src[dot_dim] = 1.0
    v_read += np.outer(dot_src, sig.out[sig.dot_id])
    for head in (0, 1):
        l1["wv"][:, kv64(head)] = v_read
        l1["wo"][qv64(head), C] = np.eye(64) * W_OUT_SCALE
    return l0, l1


def _layers_np(sig: Signatures, spec: CircuitSpec):
    """Yield (index, numpy layer dict) for every host layer."""
    l0, l1 = _build_circuit_layers_np(sig, spec)
    placed = {spec.circuit_layers[0]: l0, spec.circuit_layers[1]: l1}
    for li in range(spec.num_layers):
        yield li, placed.get(li) or _zeros_layer_np(spec)


def build_params(tokenizer, dtype=np.float32,
                 spec: CircuitSpec = BASE_SPEC) -> Dict:
    """Construct the full param pytree (jnp, high precision)."""
    import jax.numpy as jnp

    assert spec.hidden_size >= E, "circuit needs the first 256 hidden dims"
    sig = Signatures(tokenizer, num_digits=spec.num_digits)
    return {
        "embed": jnp.asarray(_build_embed_np(sig, spec).astype(dtype)),
        "final_norm": jnp.full(
            spec.hidden_size, spec.norm_scale, dtype=dtype
        ),
        "lm_head": jnp.asarray(_build_lm_head_np(sig, spec).astype(dtype)),
        "layers": tuple(
            {k: jnp.asarray(np.asarray(v, dtype)) for k, v in l.items()}
            for _, l in _layers_np(sig, spec)
        ),
    }


def _quantize_weight_int8_np(w: np.ndarray):
    """numpy twin of ops.quant.quantize_weight_int8 (per-out-channel)."""
    absmax = np.max(np.abs(w), axis=0, keepdims=True)
    scale = absmax / 127.0 + 1e-12
    wq = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return wq, scale[0].astype(np.float32)


def build_params_w8a8(tokenizer, spec: CircuitSpec = LONG_8B_SPEC,
                      quantize_embeds: bool = True) -> Dict:
    """Construct the circuit DIRECTLY in W8A8 serving form, one layer at
    a time (host-side per-channel quantization, int8 device upload).

    The full-precision 8B-geometry pytree is ~23 GB f32 — neither the
    16 GB chip nor a quantize-after-build flow can hold it; streaming
    each layer keeps host peak ~1 GB and device bytes = the deployed
    int8 model (~8 GB, the flagship footprint). Every one of the host's
    layers gets its OWN buffers (30 zero layers are not deduplicated) so
    HBM footprint and weight-read traffic equal a real checkpoint's.
    Formats match ops.quant.{quantize_layer_weights,
    quantize_embeddings_int8} exactly."""
    import jax
    import jax.numpy as jnp

    assert spec.hidden_size >= E, "circuit needs the first 256 hidden dims"
    sig = Signatures(tokenizer, num_digits=spec.num_digits)
    qkeys = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")

    def quantize_np_layer(l):
        out = {}
        for k, v in l.items():
            if k in qkeys:
                wq, ws = _quantize_weight_int8_np(v)
                out[k + "_q8"] = jnp.asarray(wq)
                out[k + "_scale"] = jnp.asarray(ws)
            else:
                # norms/biases ride bf16 like every W8A8 checkpoint here
                # (init_params_w8a8 format; cache/activation dtype)
                out[k] = jnp.asarray(np.asarray(v, np.float32),
                                     dtype=jnp.bfloat16)
        return jax.block_until_ready(out)

    # Pass-through layers are materialized ON DEVICE (one jitted zero
    # fill per layer): building them in numpy and shipping ~8 GB of int8
    # zeros through the remote-device transport costs minutes per model
    # build, while a device-side fill is instant. Buffers are still
    # DISTINCT per layer (no deduplication), so HBM footprint and
    # per-layer weight reads equal a real checkpoint's.
    zshapes = {k: (v.shape, v.dtype) for k, v in _zeros_layer_np(spec).items()}

    @jax.jit
    def device_zero_layer():
        out = {}
        for k, (shape, _) in zshapes.items():
            if k in qkeys:
                out[k + "_q8"] = jnp.zeros(shape, jnp.int8)
                out[k + "_scale"] = jnp.full(
                    (shape[-1],), 1e-12, jnp.float32
                )
            elif k in ("input_norm", "post_norm"):
                out[k] = jnp.full(shape, spec.norm_scale, jnp.bfloat16)
            else:
                out[k] = jnp.zeros(shape, jnp.bfloat16)
        return out

    l0, l1 = (quantize_np_layer(l)
              for l in _build_circuit_layers_np(sig, spec))
    placed = {spec.circuit_layers[0]: l0, spec.circuit_layers[1]: l1}
    layers = []
    for li in range(spec.num_layers):
        layer = placed.get(li)
        if layer is None:
            layer = jax.block_until_ready(device_zero_layer())
        layers.append(layer)
    params = {
        "layers": tuple(layers),
        "final_norm": jnp.full(spec.hidden_size, spec.norm_scale,
                               dtype=jnp.bfloat16),
    }
    embed = _build_embed_np(sig, spec)
    lm_head = _build_lm_head_np(sig, spec)
    if quantize_embeds:
        # per-row embed quant (ops.quant.quantize_embeddings_int8 twin)
        absmax = np.max(np.abs(embed), axis=-1, keepdims=True)
        scale = absmax / 127.0 + 1e-12
        params["embed_q8"] = jnp.asarray(
            np.clip(np.round(embed / scale), -127, 127).astype(np.int8)
        )
        params["embed_scale"] = jnp.asarray(scale[:, 0].astype(np.float32))
        hq, hs = _quantize_weight_int8_np(lm_head)
        params["lm_head_q8"] = jnp.asarray(hq)
        params["lm_head_scale"] = jnp.asarray(hs)
    else:
        params["embed"] = jnp.asarray(embed)
        params["lm_head"] = jnp.asarray(lm_head)
    return params
