"""Cache-semantics tests: the ring/sink design must present exactly the
reference's visible KV set (sink ∪ window-as-of-chunk-start ∪ causal
incoming — duo_attn/patch/llama.py:225-290, static_kv_cache.py:127-167)
without any compress copies."""

import jax.numpy as jnp
import numpy as np

from duo_attention_tpu.cache import (
    ring_mask,
    ring_slot_positions,
    sink_mask,
    write_streaming,
)


def expected_visible(qpos, chunk_start, sink, recent):
    """Reference semantics, derived independently: sink tokens plus the
    recent window as cached at chunk start plus causal incoming."""
    vis = set(g for g in range(min(sink, qpos + 1)))
    vis |= set(range(max(chunk_start - recent, 0), qpos + 1))
    return vis


def run_sim(chunks, sink, recent, chunk_cap):
    """Feed position-encoded tokens through write_streaming; after each
    chunk, check the mask-visible position set for every query."""
    B, H, D = 1, 1, 4
    R = recent + chunk_cap
    k_sink = jnp.zeros((B, H, sink + chunk_cap, D))
    v_sink = jnp.zeros_like(k_sink)
    k_ring = jnp.zeros((B, H, R, D))
    v_ring = jnp.zeros_like(k_ring)

    total = 0
    for chunk_len in chunks:
        S = min(chunk_len, chunk_cap)
        # encode global position into channel 0; pad tail with -1 sentinels
        positions = np.arange(total, total + chunk_cap)
        vals = np.zeros((B, H, chunk_cap, D))
        vals[0, 0, :, 0] = np.where(np.arange(chunk_cap) < S, positions, -999)
        vals = jnp.asarray(vals)
        k_sink, v_sink, k_ring, v_ring = write_streaming(
            k_sink, v_sink, k_ring, v_ring, vals, vals, jnp.asarray(total), sink
        )
        cs = total
        total += S
        total_after = jnp.asarray(cs + chunk_cap)  # padded total, as in model

        qpos = jnp.asarray(positions, jnp.int32)
        m_sink = np.asarray(sink_mask(qpos, sink, sink))
        m_ring = np.asarray(
            ring_mask(qpos, R, total_after, jnp.asarray(cs), sink, recent)
        )
        g_ring = np.asarray(ring_slot_positions(R, total_after))
        sink_contents = np.asarray(k_sink)[0, 0, :, 0]
        ring_contents = np.asarray(k_ring)[0, 0, :, 0]

        for qi in range(S):
            qp = cs + qi
            visible = set()
            for s in range(sink):
                if m_sink[qi, s]:
                    visible.add(int(sink_contents[s]))
            for s in range(R):
                if m_ring[qi, s]:
                    # the mask's claimed position must match buffer contents
                    assert int(ring_contents[s]) == int(g_ring[s]), (
                        f"slot {s}: mask claims {g_ring[s]}, holds {ring_contents[s]}"
                    )
                    visible.add(int(ring_contents[s]))
            want = expected_visible(qp, cs, sink, recent)
            assert visible == want, (
                f"qpos={qp} cs={cs}: got {sorted(visible)} want {sorted(want)}"
            )


def test_visible_set_full_chunks():
    run_sim([8, 8, 8, 8], sink=4, recent=8, chunk_cap=8)


def test_visible_set_partial_tail_chunk():
    # padded tail chunk must stay invisible
    run_sim([8, 8, 3], sink=4, recent=8, chunk_cap=8)


def test_visible_set_decode_after_prefill():
    # prefill then 20 single-token decode steps
    run_sim([8, 8, 5] + [1] * 20, sink=4, recent=8, chunk_cap=8)


def test_visible_set_no_sink():
    run_sim([8, 8, 1, 1, 1], sink=0, recent=4, chunk_cap=8)


def test_visible_set_large_sink_small_seq():
    # everything fits in sink+recent: nothing evicted
    run_sim([4, 4], sink=16, recent=16, chunk_cap=4)


def test_visible_set_recent_one():
    run_sim([4, 4, 1, 1], sink=2, recent=1, chunk_cap=4)
