"""Convolutional FEC: encoder + streaming Viterbi decoder.

Beyond the reference's blocklib (GR4 has no FEC) — classic gr-fec capability,
redesigned TPU-first: the Viterbi add-compare-select recursion runs as a
``lax.scan`` over received symbol pairs with ALL trellis states updated as one
vectorized [n_states] step (gather over precomputed predecessor tables), and
the traceback is a second (backward) scan. Default code: the ubiquitous
K=7, rate-1/2, polynomials 0o171/0o133 (Voyager/CCSDS/802.11).
"""

from __future__ import annotations

from fractions import Fraction

import jax
import jax.numpy as jnp
import numpy as np

from ..core.block import Block, Port
from ..core.registry import register_block
from ..core.settings import Setting


def _tables(k: int, polys: tuple[int, int]):
    """Precompute trellis tables (host NumPy, cached per (k, polys)).

    state = last k-1 input bits (newest at LSB). Input bit b moves
    s -> ((s<<1)|b) & mask; the encoder register is ((s<<1)|b) over k bits.
    Returns (enc_out[state, bit, 2], pred[state, 2], pred_bit_is: the input
    bit on entering ``state`` is state&1).
    """
    ns = 1 << (k - 1)
    mask = ns - 1
    enc_out = np.zeros((ns, 2, 2), np.int32)
    for s in range(ns):
        for b in (0, 1):
            reg = ((s << 1) | b) & ((1 << k) - 1)
            for j, g in enumerate(polys):
                enc_out[s, b, j] = bin(reg & g).count("1") & 1
    # predecessors of next-state t: the two states s with ((s<<1)|b)&mask == t
    pred = np.zeros((ns, 2), np.int32)
    for t in range(ns):
        b = t & 1
        base = t >> 1
        pred[t, 0] = base            # previous MSB was 0
        pred[t, 1] = base | (ns >> 1)  # previous MSB was 1
        # NOTE: both predecessors reach t with the SAME input bit b = t&1
    return enc_out, pred


@register_block("ConvEncoder")
class ConvEncoder(Block):
    """Rate-1/2 convolutional encoder: 1 bit in → 2 coded bits out
    (interleaved y0,y1). State carries the shift register across steps."""

    IN = (Port("in", dtype="int32"),)
    OUT = (Port("out", dtype="int32"),)
    constraint = Setting(default=7, kind="static", limits=(3, 12))
    poly0 = Setting(default=0o171, kind="static")
    poly1 = Setting(default=0o133, kind="static")

    @property
    def ratio(self):
        return Fraction(2, 1)

    def _k(self):
        return int(self.settings.get("constraint"))

    def init_state(self, ctx):
        return jnp.zeros((), jnp.int32)   # shift register (k-1 bits)

    def apply(self, state, ins, ctx):
        bits = ins["in"].astype(jnp.int32)
        k = self._k()
        g0 = int(self.settings.get("poly0"))
        g1 = int(self.settings.get("poly1"))
        enc_out, _ = _tables(k, (g0, g1))
        table = jnp.asarray(enc_out)      # [ns, 2, 2]

        def step(s, b):
            y = table[s, b]               # [2]
            s2 = ((s << 1) | b) & ((1 << (k - 1)) - 1)
            return s2, y

        s_end, pairs = jax.lax.scan(step, state, bits)
        return s_end, {"out": pairs.reshape(-1).astype(jnp.int32)}


@register_block("ViterbiDecoder")
class ViterbiDecoder(Block):
    """Streaming Viterbi decoder for the rate-1/2 code (hard bits or
    soft confidences via ``soft=True``).

    Consumes interleaved coded bits (2 per message bit), emits decoded bits
    with ``traceback`` bits of latency: each step decodes its symbols with a
    truncated traceback into the previous step's tail (path metrics AND the
    last ``traceback`` decision columns are carried state), so the stream is
    seamless across scheduler blocks.
    """

    IN = (Port("in"),)   # int32 hard bits, or float32 soft values in [0,1]
    OUT = (Port("out", dtype="int32"),)
    constraint = Setting(default=7, kind="static", limits=(3, 10))
    poly0 = Setting(default=0o171, kind="static")
    poly1 = Setting(default=0o133, kind="static")
    traceback = Setting(default=64, kind="static", limits=(8, 512))
    soft = Setting(default=False, kind="static",
                   description="input is float32 confidence in [0,1] "
                               "(0=strong 0, 1=strong 1) instead of hard bits")

    @property
    def ratio(self):
        return Fraction(1, 2)

    @property
    def alignment(self):
        return 2

    def _cfg(self):
        return (int(self.settings.get("constraint")),
                (int(self.settings.get("poly0")),
                 int(self.settings.get("poly1"))))

    def init_state(self, ctx):
        k, _ = self._cfg()
        ns = 1 << (k - 1)
        tb = int(self.settings.get("traceback"))
        m0 = jnp.full((ns,), 1e6, jnp.float32).at[0].set(0.0)
        return {"metrics": m0,
                "tail_dec": jnp.zeros((tb, ns), jnp.int32)}

    def apply(self, state, ins, ctx):
        k, polys = self._cfg()
        ns = 1 << (k - 1)
        tb = int(self.settings.get("traceback"))
        enc_out, pred = _tables(k, polys)
        predj = jnp.asarray(pred)                       # [ns, 2]
        # branch outputs for entering state t from predecessor j: the encoder
        # output of (pred[t,j], input bit t&1)
        t_idx = np.arange(ns)
        br = enc_out[pred[:, 0], t_idx & 1], enc_out[pred[:, 1], t_idx & 1]
        br = np.stack(br, axis=1)                       # [ns, 2, 2]
        brj = jnp.asarray(br.astype(np.float32))

        r = ins["in"].astype(jnp.float32).reshape(-1, 2)   # [n, 2] hard bits
        n = r.shape[0]

        def acs(m, rp):
            # branch metric: hamming distance to each entering branch
            bm = jnp.sum(jnp.abs(brj - rp[None, None, :]), axis=-1)  # [ns,2]
            cand = m[predj] + bm                                     # [ns,2]
            dec = jnp.argmin(cand, axis=-1).astype(jnp.int32)
            m2 = jnp.min(cand, axis=-1)
            m2 = m2 - jnp.min(m2)                                    # renorm
            return m2, (dec, m2)

        m_end, (decs, _) = jax.lax.scan(acs, state["metrics"], r)

        # traceback over [tail_dec ; decs] from the best end state
        all_dec = jnp.concatenate([state["tail_dec"], decs], axis=0)  # [tb+n]
        total = tb + n

        def back(s, dec_row):
            j = dec_row[s]
            p = predj[s, j]
            bit = s & 1
            return p, bit

        _, bits_rev = jax.lax.scan(back, jnp.argmin(m_end).astype(jnp.int32),
                                   all_dec, reverse=True)
        bits = bits_rev.astype(jnp.int32)   # one decoded bit per trellis row
        # rows ≥ tb from the end of the traceback are converged: that is
        # exactly the OLDEST n rows — emit them (stream latency = tb bits;
        # the first tb output bits of a fresh stream are startup garbage,
        # like a filter's group-delay transient)
        emit = bits[:n]
        new_tail = jax.lax.dynamic_slice_in_dim(all_dec, total - tb, tb)
        return ({"metrics": m_end, "tail_dec": new_tail},
                {"out": emit})


@register_block("Scrambler")
class Scrambler(Block):
    """Multiplicative (self-synchronizing) LFSR scrambler over bits
    (≈ GNU Radio scrambler_bb): out[n] = in[n] ⊕ parity(mask & reg);
    reg shifts in out[n]. Default CCSDS/V.35-style x^7+x^4+1 (mask 0o221→
    taps at 7,4 ⇒ mask 0x48, length 7)."""

    IN = (Port("in", dtype="int32"),)
    OUT = (Port("out", dtype="int32"),)
    mask = Setting(default=0x48, kind="static",
                   description="feedback tap mask over the register")
    length = Setting(default=7, kind="static", limits=(2, 30))
    seed = Setting(default=0x7F, kind="static")

    _DESCRAMBLE = False

    def init_state(self, ctx):
        return jnp.asarray(int(self.settings.get("seed")), jnp.int32)

    def apply(self, state, ins, ctx):
        bits = ins["in"].astype(jnp.int32)
        mask = int(self.settings.get("mask"))
        length = int(self.settings.get("length"))
        regmask = (1 << length) - 1

        def parity(v):
            # popcount & 1 over <=30 bits, vectorized-friendly
            v = v ^ (v >> 16)
            v = v ^ (v >> 8)
            v = v ^ (v >> 4)
            v = v ^ (v >> 2)
            v = v ^ (v >> 1)
            return v & 1

        descramble = self._DESCRAMBLE

        def step(reg, b):
            fb = parity(reg & mask)
            y = b ^ fb
            shift_in = b if descramble else y   # self-synchronizing property
            reg2 = ((reg << 1) | shift_in) & regmask
            return reg2, y

        reg_end, out = jax.lax.scan(step, state, bits)
        return reg_end, {"out": out.astype(jnp.int32)}


@register_block("Descrambler")
class Descrambler(Scrambler):
    """Inverse of :class:`Scrambler`; self-synchronizes after ``length`` bits
    regardless of seed (≈ GNU Radio descrambler_bb)."""

    _DESCRAMBLE = True
