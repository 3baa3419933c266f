"""Bounded-memory streaming reduction for the counting decoders.

The round-3 counting decoders (STDC/STRC/PTDC/PTRC) materialized the full
sample stream in HBM — (B, K, droplets*steps) keys + per-Pauli counts, ~20
bytes/sample — so the reference's *default* budgets (droplets=10 x
steps=20000, /root/reference/decoders.py:268) needed ~33 GB at production
batch.  This module replaces the materialized stream with a windowed
on-device reduction: the scan carry holds, per output row, a bounded
buffer of the ``capacity`` lowest-rank unique chains plus O(nq) occupancy
accumulators, and every window of W recorded samples is sort-merged into
it.  Peak memory is O(rows * (capacity + droplets*window)) independent of
``steps``.

Exactness invariant (why bounded eviction loses nothing it shouldn't):
the buffer always contains the ``capacity`` smallest unique chains seen so
far, ordered lexicographically by (rank, key).  Proof sketch: suppose the
invariant holds before a merge.  A chain of the updated "seen" set that
ranks among its ``capacity`` smallest is either in this window or was
among the ``capacity`` smallest of the *old* seen set (a subset), i.e. in
the buffer — so it is among the merge candidates, and taking the
``capacity`` smallest candidates retains exactly the ``capacity`` smallest
of the whole stream.  An evicted chain that reappears later is simply
re-evicted by the same argument.  Consequently:

- with rank = Boltzmann weight  sum_i beta_err_i n_i  (STDC/PTDC), the
  final buffer holds the ``capacity`` largest-weight contributions to
  Z = sum_unique exp(-w); overflow drops only exponentially-suppressed
  tails (``overflow`` flags it; every dropped unique chain contributes
  less than exp(-``max_kept``) to Z);
- with rank = total length n (STRC/PTRC), unique-per-length counts N(n)
  are exact for every n strictly below the largest kept rank.

The reference semantics being replaced: host dict dedup keyed by
``hash(qubit_matrix.tobytes())`` (decoders.py:251-254, 597-623, 768-781)
with droplet dicts merged by union (decoders.py:313-314, 883-928) — here
all droplets feed one row buffer, so the merge is the union, performed
incrementally.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.base import CodeSpec

SENTINEL = np.uint32(0xFFFFFFFF)
# default size of the conv_mult equal-shortest-length key buffer; callers
# that pass streaming_scan a different conv_mult_unique_cap must report
# that value in warn_conv_mult_overflow
CONV_MULT_UNIQUE_CAP = 64


class StreamState(NamedTuple):
    """Per-row streaming reduction state (leading axis R = output rows)."""

    k1: jax.Array  # (R, C) uint32 — unique-chain key halves (SENTINEL empty)
    k2: jax.Array  # (R, C) uint32
    r: jax.Array  # (R, C) float32 — rank scalar (+inf empty)
    m_n: jax.Array  # (R, nq+2) int32 — total observations per length (occupancy)
    n_unique: jax.Array  # (R,) int32 — unique chains discovered (exact until
    #                        overflow; an upper bound after — re-discovered
    #                        evicted chains count again)
    n_unique_half: jax.Array  # (R,) int32 — n_unique at the stream's halfway point
    overflow: jax.Array  # (R,) bool — capacity was ever exceeded
    max_kept: jax.Array  # (R,) float32 — largest rank currently kept (inf if
    #                        not full); with rank=w, every dropped unique chain
    #                        contributes < exp(-max_kept) to Z


def init_stream_state(R: int, capacity: int, nq: int) -> StreamState:
    return StreamState(
        k1=jnp.full((R, capacity), SENTINEL, jnp.uint32),
        k2=jnp.full((R, capacity), SENTINEL, jnp.uint32),
        r=jnp.full((R, capacity), jnp.inf, jnp.float32),
        m_n=jnp.zeros((R, nq + 2), jnp.int32),
        n_unique=jnp.zeros((R,), jnp.int32),
        n_unique_half=jnp.zeros((R,), jnp.int32),
        overflow=jnp.zeros((R,), bool),
        max_kept=jnp.full((R,), jnp.inf, jnp.float32),
    )


def _merge_row(k1, k2, r, nk1, nk2, nr):
    """Merge one row buffer (C entries) with window candidates (S entries,
    invalid ones pre-sentineled: key=SENTINEL, r=+inf).  Returns the new
    (k1, k2, r) of the ``C`` lexicographically-smallest (r, k1, k2) unique
    entries plus (n_discovered, overflowed_now, max_kept)."""
    C = k1.shape[0]
    a1 = jnp.concatenate([k1, nk1])
    a2 = jnp.concatenate([k2, nk2])
    ar = jnp.concatenate([r, nr])
    # 1) key-sort so duplicates are adjacent (r is a function of the chain
    #    content, so duplicate entries carry identical r)
    s1, s2, sr = jax.lax.sort((a1, a2, ar), num_keys=2)
    dup = (s1 == jnp.roll(s1, 1)) & (s2 == jnp.roll(s2, 1))
    dup = dup.at[0].set(False)
    alive = ~dup & jnp.isfinite(sr)
    n_before = jnp.sum(jnp.isfinite(r)).astype(jnp.int32)
    n_alive = jnp.sum(alive).astype(jnp.int32)
    rr = jnp.where(alive, sr, jnp.inf)
    b1 = jnp.where(alive, s1, SENTINEL)
    b2 = jnp.where(alive, s2, SENTINEL)
    # 2) rank-sort (key tiebreak keeps eviction deterministic) and truncate
    rr2, b1, b2 = jax.lax.sort((rr, b1, b2), num_keys=3)
    overflowed = jnp.isfinite(rr2[C]) if rr2.shape[0] > C else jnp.asarray(False)
    full = jnp.isfinite(rr2[C - 1])
    max_kept = jnp.where(full, rr2[C - 1], jnp.inf)
    return (b1[:C], b2[:C], rr2[:C], n_alive - n_before, overflowed, max_kept)


class ConvMultState(NamedTuple):
    """Per-(row, droplet) state of the reference's shortest-chain extension
    rule (decoders.py:249-263): every *new* chain with length <= the running
    shortest extends the stop point to step*conv_mult; a droplet stops
    recording at the first step with step >= stop and step*100 >= steps.

    Novelty at the current shortest length is tracked exactly through a
    small per-droplet key buffer (cap ``U``) of the distinct chains seen at
    that length — a strictly shorter chain is always new (it could not have
    been seen while the running shortest exceeded its length).  If the
    buffer overflows, further equal-length chains count as not-new, which
    can only stop sampling earlier (a conservative approximation of the
    reference's unbounded dict; flagged via ``kovf``)."""

    sh_len: jax.Array  # (R, D) int32 current shortest length (init nq+1)
    stop: jax.Array  # (R, D) float32 extension point
    broken: jax.Array  # (R, D) bool recording stopped
    kbuf: jax.Array  # (R, D, U, 2) uint32 keys at the shortest length
    nk: jax.Array  # (R, D) int32 occupancy of kbuf
    kovf: jax.Array  # (R, D) bool kbuf overflowed at current shortest


def init_conv_mult(R: int, D: int, U: int, nq: int, steps: int) -> ConvMultState:
    return ConvMultState(
        sh_len=jnp.full((R, D), nq + 1, jnp.int32),
        stop=jnp.full((R, D), float(steps), jnp.float32),
        broken=jnp.zeros((R, D), bool),
        kbuf=jnp.full((R, D, U, 2), SENTINEL, jnp.uint32),
        nk=jnp.zeros((R, D), jnp.int32),
        kovf=jnp.zeros((R, D), bool),
    )


def _conv_mult_window(cm: ConvMultState, keys, n, t0, conv_mult: float,
                      steps: int):
    """Advance the per-droplet automaton over one window.

    keys: (R, D, W, 2) uint32; n: (R, D, W) int32 total lengths; t0: scalar
    global index of the window's first recorded step.  Returns (new state,
    valid (R, D, W) bool)."""
    U = cm.kbuf.shape[2]

    def per_droplet(carry, inp):
        sh_len, stop, broken, kbuf, nk, kovf = carry
        t, kk, nt = inp  # scalar, (2,), scalar
        shorter = nt < sh_len
        equal = nt == sh_len
        in_buf = jnp.any(
            jnp.all(kbuf == kk[None, :], axis=-1)
            & (jnp.arange(U) < nk)
        )
        new_equal = equal & ~in_buf & ~kovf
        is_new_short = shorter | new_equal
        # append on new_equal (if room), reset buffer on shorter
        append = new_equal & (nk < U)
        ovf_now = new_equal & (nk >= U)
        slot = jnp.where(shorter, 0, nk)
        onehot = (jnp.arange(U) == slot)[:, None]
        base = jnp.where(shorter, jnp.full_like(kbuf, SENTINEL), kbuf)
        write = shorter | append
        kbuf = jnp.where(write & onehot, kk[None, :], base)
        nk = jnp.where(shorter, 1, nk + append.astype(jnp.int32))
        kovf = jnp.where(shorter, False, kovf | ovf_now)
        sh_len = jnp.where(shorter, nt, sh_len)
        stop = jnp.where(is_new_short, t * conv_mult, stop)
        valid = ~broken
        broken = broken | ((t >= stop) & (t * 100 >= steps))
        return (sh_len, stop, broken, kbuf, nk, kovf), valid

    W = keys.shape[2]
    ts = (t0 + jnp.arange(W)).astype(jnp.float32)

    def row_droplet(sh_len, stop, broken, kbuf, nk, kovf, kk, nn):
        (sh_len, stop, broken, kbuf, nk, kovf), valid = jax.lax.scan(
            per_droplet, (sh_len, stop, broken, kbuf, nk, kovf),
            (ts, kk, nn),
        )
        return sh_len, stop, broken, kbuf, nk, kovf, valid

    f = jax.vmap(jax.vmap(row_droplet))
    sh_len, stop, broken, kbuf, nk, kovf, valid = f(
        cm.sh_len, cm.stop, cm.broken, cm.kbuf, cm.nk, cm.kovf, keys, n
    )
    return ConvMultState(sh_len, stop, broken, kbuf, nk, kovf), valid


def streaming_scan(
    chunk_sampler: Callable,
    states,
    key: jax.Array,
    *,
    steps: int,
    window: int,
    capacity: int,
    rank_fn: Callable[[jax.Array], jax.Array],  # n_xyz (...,3) -> rank (...) f32
    nq: int,
    R: int,
    D: int,
    conv_mult: float = 0.0,
    conv_mult_unique_cap: int = CONV_MULT_UNIQUE_CAP,
    track_occupancy: bool = True,
):
    """Run ``ceil(steps/window)`` sampling windows, folding each into the
    bounded per-row reduction.  ``chunk_sampler(states, key) -> (states,
    keys (R, D, W, 2) uint32, n_xyz (R, D, W, 3) int32)`` records W samples
    per droplet per window (droplets = independent chains feeding the same
    row buffer: droplet fan-in for STDC/STRC, ladder rungs for PTDC).

    Returns (states, StreamState, ConvMultState-or-None).  The
    ConvMultState is returned (None when ``conv_mult`` is 0) so callers can
    surface ``kovf`` — the equal-shortest-length key-buffer overflow that
    makes the early-stop rule fire sooner than the reference's unbounded
    dict would (see warn_conv_mult_overflow).  Samples with global index
    >= steps (the final window's tail) are masked out, so any window size
    is valid.
    """
    n_windows = -(-steps // window)
    half = (steps // 2)
    st = init_stream_state(R, capacity, nq)
    cm = init_conv_mult(R, D, conv_mult_unique_cap, nq, steps) \
        if conv_mult else None

    def body(carry, inp):
        states, st, cm = carry
        w, k = inp
        states, keys, n_xyz = chunk_sampler(states, k)
        W = keys.shape[2]
        t0 = (w * window).astype(jnp.float32)
        n_tot = jnp.sum(n_xyz, axis=-1).astype(jnp.int32)  # (R, D, W)
        t_idx = w * window + jnp.arange(W)  # (W,)
        valid = jnp.broadcast_to(t_idx < steps, (R, D, W))
        if cm is not None:
            cm, v_cm = _conv_mult_window(cm, keys, n_tot, t0,
                                         conv_mult, steps)
            valid = valid & v_cm
        rank = rank_fn(n_xyz)  # (R, D, W) f32
        # flatten droplets into the candidate axis, sentinel the invalid
        S = D * W
        fk1 = jnp.where(valid, keys[..., 0], SENTINEL).reshape(R, S)
        fk2 = jnp.where(valid, keys[..., 1], SENTINEL).reshape(R, S)
        fr = jnp.where(valid, rank, jnp.inf).reshape(R, S)
        k1, k2, r, disc, ovf, mk = jax.vmap(_merge_row)(
            st.k1, st.k2, st.r, fk1, fk2, fr
        )
        n_unique = st.n_unique + disc
        # occupancy: bincount all valid observations by total length
        if track_occupancy:
            fn_ = jnp.where(valid, n_tot, nq + 1).reshape(R, S)
            add = jax.vmap(
                lambda idx, v: jnp.zeros(nq + 2, jnp.int32).at[idx].add(v)
            )(fn_, valid.reshape(R, S).astype(jnp.int32))
            m_n = st.m_n + add
        else:
            m_n = st.m_n
        at_half = (w + 1) * window >= half
        was_before = w * window < half
        n_half = jnp.where(at_half & was_before, n_unique, st.n_unique_half)
        st = StreamState(
            k1=k1, k2=k2, r=r, m_n=m_n, n_unique=n_unique,
            n_unique_half=n_half, overflow=st.overflow | ovf, max_kept=mk,
        )
        return (states, st, cm), None

    ks = jax.random.split(key, n_windows)
    (states, st, cm), _ = jax.lax.scan(
        body, (states, st, cm), (jnp.arange(n_windows), ks)
    )
    return states, st, cm


def warn_stream_overflow(overflow: np.ndarray, max_kept: np.ndarray,
                         min_rank: np.ndarray, n_samples: int,
                         name: str, capacity: int,
                         rel_tol: float = 1e-9) -> None:
    """Z truncation observability for the direct-counting stream paths
    (STDC/PTDC): when a row's buffer overflowed, unique chains beyond the
    ``capacity`` lowest-weight ones were dropped from Z.  Each dropped
    chain contributes < exp(-max_kept) while Z >= exp(-min_rank), and at
    most ``n_samples`` distinct chains can have been dropped, so the
    RELATIVE Z deficit is < n_samples * exp(-(max_kept - min_rank)).
    Overflow at production budgets routinely truncates only an utterly
    negligible Boltzmann tail (bounds ~1e-13 observed at the reference's
    d=9 default budget) — warn only when the bound exceeds ``rel_tol``."""
    ovf = np.asarray(overflow)
    if not ovf.any():
        return
    gap = np.asarray(max_kept) - np.asarray(min_rank)
    rel = np.where(ovf, float(n_samples) * np.exp(-np.maximum(gap, 0.0)),
                   0.0)
    bad = int((rel > rel_tol).sum())
    if bad:
        import warnings

        warnings.warn(
            f"{name}: unique-chain buffer (stream_capacity={capacity}) "
            f"overflowed with a non-negligible dropped tail in {bad} "
            f"(row, class) cells — worst relative Z deficit bound "
            f"{float(rel.max()):.2e}; raise stream_capacity (or use "
            f"stream=False)",
            RuntimeWarning,
            stacklevel=3,
        )


def warn_conv_mult_overflow(kovf: np.ndarray, name: str, cap: int) -> None:
    """The streaming conv_mult automaton tracks novelty at the running
    shortest length through a bounded key buffer; on overflow further
    equal-length chains count as not-new, so the early-stop rule can fire
    EARLIER than the reference's unbounded dict (fewer samples recorded —
    conservative, but worth surfacing)."""
    bad = int(np.asarray(kovf).sum())
    if bad:
        import warnings

        warnings.warn(
            f"{name}: conv_mult shortest-chain key buffer "
            f"(conv_mult_unique_cap={cap}) overflowed in {bad} "
            f"(row, droplet) cells — the extension rule may have stopped "
            f"those droplets earlier than the reference rule; raise "
            f"conv_mult_unique_cap",
            RuntimeWarning,
            stacklevel=3,
        )


# ---------------------------------------------------------------------------
# Reductions from the final buffer
# ---------------------------------------------------------------------------


def logz_from_stream(
    st: StreamState,
    shortest_only: bool = False,
    with_shortest: bool = False,
):
    """log Z = logsumexp over the kept unique chains of -rank (the STDC
    Boltzmann sum, decoders.py:317-318) — requires the stream to have been
    built with rank = weighted length.  Empty buffers yield -inf."""
    neg = jnp.where(jnp.isfinite(st.r), -st.r, -jnp.inf)

    def reduce(mask):
        m = jnp.max(jnp.where(mask, neg, -jnp.inf), axis=-1, keepdims=True)
        m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
        s = jnp.sum(jnp.where(mask, jnp.exp(neg - m_safe), 0.0), axis=-1)
        return m[..., 0] + jnp.log(jnp.maximum(s, 1e-30))

    fin = jnp.isfinite(st.r)
    if shortest_only or with_shortest:
        wmin = jnp.min(st.r, axis=-1, keepdims=True)
        short = fin & jnp.isclose(st.r, wmin, rtol=1e-5, atol=1e-8)
        if with_shortest:
            return reduce(fin), reduce(short)
        return reduce(short)
    return reduce(fin)


class StreamOccupancy(NamedTuple):
    m_n: jax.Array  # (R, nq+1) total observations per length
    N_n: jax.Array  # (R, nq+1) unique chains per length (exact below
    #                  the truncation rank; see trunc_at)
    shortest: jax.Array  # (R,) minimal observed length
    next_shortest: jax.Array  # (R,) second-smallest observed length (nq+1 none)
    trunc_at: jax.Array  # (R,) N(n) is exact for n < trunc_at (inf if never
    #                        overflowed)


def occupancy_from_stream(st: StreamState, nq: int) -> StreamOccupancy:
    """m(n), N(n), shortest/next-shortest (the STRC/PTRC machinery,
    decoders.py:597-623, 768-827) from a stream built with rank = total
    length n."""
    R = st.r.shape[0]
    n_idx = jnp.where(
        jnp.isfinite(st.r), st.r.astype(jnp.int32), nq + 1
    )
    N_n = jax.vmap(
        lambda idx: jnp.zeros(nq + 2, jnp.int32).at[idx].add(1)
    )(n_idx)[:, : nq + 1]
    m_n = st.m_n[:, : nq + 1]
    has = m_n > 0
    idx = jnp.arange(nq + 1)
    shortest = jnp.min(jnp.where(has, idx, nq + 1), axis=-1)
    nxt = jnp.min(
        jnp.where(has & (idx[None, :] > shortest[:, None]), idx, nq + 1),
        axis=-1,
    )
    trunc = jnp.where(st.overflow, st.max_kept, jnp.inf)
    return StreamOccupancy(m_n, N_n, shortest, nxt, trunc)


# ---------------------------------------------------------------------------
# Chunk samplers
# ---------------------------------------------------------------------------


# materialized-path cost model: 8 key bytes + 12 n_xyz bytes per sample
STREAM_BYTES_PER_SAMPLE = 20
# stream="auto" switches to the bounded-memory path above this many bytes
STREAM_AUTO_BYTES = 1 << 30


def should_stream(stream, rows: int, droplets: int, steps: int) -> bool:
    """Resolve the ``stream`` knob shared by STDC/STRC/PTDC/PTRC:
    "auto" switches on once the materialized sample stream would exceed
    ~1 GiB; True/False force a path.  Any other value is rejected (a
    string like "off" must not silently truthy-enable streaming)."""
    if isinstance(stream, str):
        if stream != "auto":
            raise ValueError(
                f"stream={stream!r}: expected 'auto', True or False"
            )
        return rows * droplets * steps * STREAM_BYTES_PER_SAMPLE \
            > STREAM_AUTO_BYTES
    if not isinstance(stream, (bool, np.bool_, int)):
        raise ValueError(
            f"stream={stream!r}: expected 'auto', True or False"
        )
    return bool(stream)
