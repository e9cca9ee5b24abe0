"""Graph → jitted XLA program.

The reference pumps samples through per-block virtual ``work()`` calls scheduled by
thread pools (core/include/gnuradio-4.0/Scheduler.hpp:722 poolWorker →
Block.hpp:2054 workInternal). TPU-native inversion: the *entire flattened graph* is
traced once into a single jitted step function

    step(states, params, feeds) → (states', sink_inputs)

so XLA fuses all elementwise blocks into neighboring FFT/matmul kernels, keeps
intermediates in VMEM/HBM without host round-trips, and the only per-step host work is
feeding sources and draining sinks. Carried block state (FIR tails, NCO phase — the
analog of HistoryBuffer) threads through the step as a donated pytree, so state stays
on-device across steps.

Static shapes: per-edge samples-per-step come from Graph.resolve_rates (the rate
algebra replacing the reference's per-work() computeResampling, Block.hpp:1611).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from .block import Block, BlockCtx, SinkBlock
from .errors import GrError
from .graph import Edge, Graph
from .stream import canonical_dtype


@dataclasses.dataclass
class CompiledGraph:
    """A jit-compiled, rate-resolved flowgraph ready for the streaming scheduler."""

    graph: Graph                      # flattened
    order: list[Block]
    in_len: dict[str, int]            # block unique_name → input samples/step
    out_len: dict[str, int]
    block_ctx: dict[str, BlockCtx]
    step_fn: Callable                 # jitted
    fed_blocks: list[Block]           # sources taking host-fed arrays
    sink_names: list[str]
    sample_rate: float
    block_len: int
    mesh: Any = None

    # -- runtime-facing helpers ------------------------------------------------
    def init_states(self) -> dict[str, Any]:
        return {b.unique_name: b.init_state(self.block_ctx[b.unique_name])
                for b in self.order}

    _params_cache: Any = None

    def gather_params(self) -> dict[str, dict[str, Any]]:
        """Dynamic params for the next step. Blocks that override
        ``prepare_params`` (tag-derived values) refresh every step; the rest are
        cached until :meth:`invalidate_params` (settings applied)."""
        from .block import Block
        if self._params_cache is None:
            self._params_cache = {
                b.unique_name: b.prepare_params(b.settings.dynamic_params())
                for b in self.order}
        else:
            for b in self.order:
                if type(b).prepare_params is not Block.prepare_params:
                    self._params_cache[b.unique_name] = b.prepare_params(
                        b.settings.dynamic_params())
        return self._params_cache

    def invalidate_params(self) -> None:
        self._params_cache = None

    _zero_feeds_cache: Any = None

    def zero_feeds(self) -> dict[str, dict[str, np.ndarray]]:
        if self._zero_feeds_cache is None:
            feeds: dict[str, dict[str, np.ndarray]] = {}
            for b in self.fed_blocks:
                ctx = self.block_ctx[b.unique_name]
                feeds[b.unique_name] = {
                    p.name: np.zeros(_shape(ctx.channels.get(p.name, 0),
                                            ctx.out_len[p.name]),
                                     dtype=_feed_dtype(b, p.name))
                    for p in b.out_ports}
            self._zero_feeds_cache = feeds
        return self._zero_feeds_cache

    def in_edges_by_dst(self) -> dict[str, list]:
        if not hasattr(self, "_in_edges_cache") or self._in_edges_cache is None:
            m: dict[str, list] = {b.unique_name: [] for b in self.order}
            for e in self.graph.edges:
                m[e.dst.unique_name].append(e)
            self._in_edges_cache = m
        return self._in_edges_cache

    def step(self, states, params, feeds):
        return self.step_fn(states, params, feeds)


def _shape(channels: int, n: int) -> tuple[int, ...]:
    return (n,) if channels == 0 else (channels, n)


def _feed_dtype(block: Block, port: str):
    d = block.out_dtype(port, {})
    return np.dtype(canonical_dtype(d)) if d is not None else np.float32


def compile_graph(graph: Graph, *, block_len: int = 1 << 16,
                  sample_rate: float = 1.0, mesh: Any = None,
                  jit: bool = True, donate_state: bool = True) -> CompiledGraph:
    """Flatten, validate, solve rates/dtypes/channels, trace, and jit the graph.

    Mesh lowering: a mesh axis named ``sp`` time-shards the WHOLE graph — the
    step is traced inside ``shard_map`` (manual over ``sp``), every stream value
    becomes a local time shard, and each block lowers per its sp protocol
    (Block.sp_halo: time-local map / ppermute halo exchange / replicated gather
    island). A ``chan`` axis (without ``sp``) shards multi-channel streams via
    GSPMD constraints. This is the runtime parallelizing *arbitrary* flowgraphs,
    the analog of the reference scheduler running any graph over its worker
    pool (Scheduler.hpp:79-86,722).
    """
    flat = graph.flatten()
    flat.validate()
    # Edge ComputeDomain consumption (≈ reference per-edge domain consumed at
    # buffer binding, BlockModel.hpp:89-97): a 'host' domain forces the dst
    # block's inputs through the host each step (HOST_TAP delivery — the data
    # crosses the device→host boundary instead of staying fused on device).
    from .compute_domain import DomainKind
    for e in flat.edges:
        if e.domain is None:
            continue
        if e.domain.kind in (DomainKind.GPU, DomainKind.FPGA):
            raise GrError(f"edge {e} requests compute domain "
                          f"{e.domain.kind.value!r}; this build targets "
                          f"tpu/host only")
        if e.domain.kind is DomainKind.HOST:
            if not hasattr(e.dst, "consume"):
                raise GrError(
                    f"edge {e} has domain=host but {e.dst.name} has no "
                    f"consume() hook to receive host-side data; use a "
                    f"SinkBlock or a block with HOST_TAP semantics")
            e.dst.HOST_TAP = True
    order = flat.topological_order()
    sp = int(mesh.shape["sp"]) if (
        mesh is not None and "sp" in getattr(mesh, "axis_names", ())) else 1
    in_len, out_len = flat.resolve_rates(block_len, sample_rate, shard=sp)

    # per-edge dtype/channel resolution (compile-time type inference over the DAG)
    in_edges: dict[str, list[Edge]] = {b.unique_name: [] for b in flat.blocks}
    for e in flat.edges:
        in_edges[e.dst.unique_name].append(e)

    block_ctx: dict[str, BlockCtx] = {}
    out_channels: dict[tuple[str, str], int] = {}
    out_dtypes: dict[tuple[str, str], Any] = {}

    for b in order:
        ins = in_edges[b.unique_name]
        in_ch = {e.dst_port: out_channels[(e.src.unique_name, e.src_port)] for e in ins}
        in_dt = {e.dst_port: out_dtypes[(e.src.unique_name, e.src_port)] for e in ins}
        # input-side sample rate = the producing edges' resolved rate
        rate_b = max((e.sample_rate for e in ins), default=sample_rate)
        ch_map: dict[str, int] = dict(in_ch)
        for p in b.out_ports:
            ch = b.out_channels(p.name, in_ch)
            dt = canonical_dtype(b.out_dtype(p.name, in_dt))
            out_channels[(b.unique_name, p.name)] = ch
            out_dtypes[(b.unique_name, p.name)] = dt
            ch_map[p.name] = ch
        n_in = in_len[b.unique_name]
        n_out = out_len[b.unique_name]
        dt_map = dict(in_dt)
        for p in b.out_ports:
            dt_map[p.name] = out_dtypes[(b.unique_name, p.name)]
        block_ctx[b.unique_name] = BlockCtx(
            in_len={p.name: n_in for p in b.in_ports},
            out_len={p.name: n_out for p in b.out_ports},
            sample_rate=rate_b,
            params={},  # filled per-trace
            channels=ch_map,
            dtypes=dt_map,
            mesh=mesh,
        )
    for e in flat.edges:
        e.channels = out_channels[(e.src.unique_name, e.src_port)]
        e.dtype = out_dtypes[(e.src.unique_name, e.src_port)]
        # resolved-dtype check against declared input port types (≈ Graph.hpp:493)
        for p in e.dst.in_ports:
            if p.name == e.dst_port and p.dtype is not None \
                    and np.dtype(p.dtype) != np.dtype(e.dtype):
                raise GrError(
                    f"dtype mismatch on {e}: {e.src.name}.{e.src_port} produces "
                    f"{np.dtype(e.dtype).name}, {e.dst.name}.{e.dst_port} expects "
                    f"{np.dtype(p.dtype).name}")

    fed_blocks = [b for b in order if getattr(b, "FEED", False)]
    fed_names = {b.unique_name for b in fed_blocks}
    # sinks: terminal blocks + HOST_TAP blocks (mid-graph blocks whose inputs
    # must reach the host each step, e.g. nested-scheduler subgraphs)
    sinks = [b for b in order if isinstance(b, SinkBlock) or not b.out_ports
             or getattr(b, "HOST_TAP", False)]
    sink_names = [b.unique_name for b in sinks]

    # local (per-shard) contexts for the sp path: lengths divided by sp
    local_ctx = {
        uname: dataclasses.replace(
            c, in_len={k: v // sp for k, v in c.in_len.items()},
            out_len={k: v // sp for k, v in c.out_len.items()})
        for uname, c in block_ctx.items()} if sp > 1 else block_ctx

    def step(states, params, feeds):
        values: dict[tuple[str, str], jnp.ndarray] = {}
        new_states = {}
        sink_ins: dict[str, dict[str, jnp.ndarray]] = {}
        for b in order:
            uname = b.unique_name
            ctx = dataclasses.replace(block_ctx[uname], params=params.get(uname, {}))
            ins = {e.dst_port: values[(e.src.unique_name, e.src_port)]
                   for e in in_edges[uname]}
            if uname in fed_names:
                # host-fed sources see their fed arrays as inputs (identity default)
                ins = {**feeds.get(uname, {}), **ins}
            if uname in sink_names:
                sink_ins[uname] = ins
            try:
                if sp > 1:
                    lctx = dataclasses.replace(local_ctx[uname],
                                               params=ctx.params)
                    st, outs = b.apply_sp(states.get(uname), ins, ctx, lctx,
                                          "sp")
                else:
                    st, outs = b.apply(states.get(uname), ins, ctx)
            except Exception as e:
                if isinstance(e, GrError):
                    raise
                raise GrError(f"{b.name} ({type(b).__name__}).apply failed "
                              f"during trace: {type(e).__name__}: {e}",
                              block=b.name) from e
            new_states[uname] = st
            for pname, arr in outs.items():
                if mesh is not None and sp == 1:
                    # GSPMD: constrain multi-channel streams onto the mesh —
                    # XLA partitions the fused program + inserts collectives
                    spec = b.out_sharding(pname, mesh,
                                          out_channels.get((uname, pname), 0))
                    if spec is not None:
                        from jax.sharding import NamedSharding
                        arr = jax.lax.with_sharding_constraint(
                            arr, NamedSharding(mesh, spec))
                values[(uname, pname)] = arr
        return new_states, sink_ins

    step_fn = step
    if sp > 1:
        from jax.sharding import PartitionSpec as P

        def _tspec(channels: int) -> Any:
            return P("sp") if channels == 0 else P(None, "sp")

        state_specs = {b.unique_name: P() for b in order}   # replicated
        feed_specs = {}
        for b in fed_blocks:
            ctx = block_ctx[b.unique_name]
            feed_specs[b.unique_name] = {
                p.name: _tspec(ctx.channels.get(p.name, 0))
                for p in b.out_ports}
        sink_specs: dict[str, dict[str, Any]] = {}
        for uname in sink_names:
            specs: dict[str, Any] = {}
            for e in flat.edges:
                if e.dst.unique_name == uname:
                    specs[e.dst_port] = _tspec(e.channels)
            b = next(bb for bb in order if bb.unique_name == uname)
            if uname in fed_names:   # fed host-tap: feeds appear in its ins
                ctx = block_ctx[uname]
                for p in b.out_ports:
                    specs.setdefault(p.name,
                                     _tspec(ctx.channels.get(p.name, 0)))
            sink_specs[uname] = specs
        step_fn = jax.shard_map(
            step, mesh=mesh, in_specs=(state_specs, P(), feed_specs),
            out_specs=(state_specs, sink_specs), axis_names={"sp"},
            check_vma=False)
    if jit:
        donate = (0,) if donate_state else ()
        step_fn = jax.jit(step_fn, donate_argnums=donate)

    return CompiledGraph(
        graph=flat, order=order, in_len=in_len, out_len=out_len,
        block_ctx=block_ctx, step_fn=step_fn, fed_blocks=fed_blocks,
        sink_names=sink_names, sample_rate=sample_rate,
        block_len=in_len[order[0].unique_name] if order else block_len, mesh=mesh)
