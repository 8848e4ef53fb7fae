"""TPU wavefront search: batched QT partition + intra mode decision.

Restructures the reference's depth-first mutate-and-rollback recursion
(block_splitter.rs:782) into two phases designed for the TPU's execution
model (SURVEY.md §7.1):

Stage A — decision (fully parallel): every aligned block of every QT size
is evaluated for all 67 intra modes at once (the mode sweep is two MXU
matmuls, kernels/intra_pred.py), using original-pixel references. Top
candidates by SAD get full RD (transform + greedy dep-quant + rate model),
then the QT is decided bottom-up by parallel cost reduction. Original-pixel
references make every block independent; the reconstruction-feedback error
this introduces is small and is the standard fast-encoder trade.

Stage B — commit (native, coding order): the final decisions are made
against TRUE reconstructed references, the reference encoder's decision
discipline (block_splitter.rs:110). Per CU the leaf mode is re-chosen
among the stage-A candidate list by full trellis RD with the exact
MPM-aware mode-bit model, the chroma CCLM-vs-derived choice is re-made,
and QT split decisions whose stage-A margin was small are re-decided with
snapshot/rollback (block_splitter.rs:1079-1152). Runs in the native C++
committer, threaded across frames; the NumPy rank-wavefront path remains
as fallback (stage-A decisions applied as-is).
"""
import numpy as np

import jax.numpy as jnp

from ..core import tables
from ..entropy.structure import CtNode, CuDecision
from ..kernels import intra_pred, np_ops, quantize as kq, refs, transforms
from ..spec import quant

import jax
import functools


class WavefrontSearch:
    def __init__(self, cfg, trellis_commit=True, mesh=None, rd_commit=True,
                 commit_engine=None, chroma_stage_a=None):
        """mesh: optional jax.sharding.Mesh with a 'frame' axis — the frame
        batch of stage A is sharded across it (all-intra frames are
        independent, so this is pure data parallelism; SURVEY.md §2.3).
        Host passes (commit, entropy) are per-frame and unaffected.

        commit_engine: 'native' (threaded C++ RdCommitter, the
        bit-exactness oracle) or 'device' (the fused lax.scan rank
        wavefront in search/device_commit.py — same re-decision
        discipline, refine margin forced to 0). Default from
        WRENC_COMMIT_ENGINE, else 'native'."""
        import os
        cfg.validate()
        self.cfg = cfg
        self.mesh = mesh
        self.rm = cfg.rate_model
        self.trellis_commit = trellis_commit
        # commit engine default: 'native' at every geometry (round-5
        # measurements on the real chip, one-pass in-scan device engine,
        # all engine pairs byte-identical at clip scale —
        # results/engine_ab.json). The device scan closed most of the
        # gap this round but the refreshed native pipeline (fused device
        # chroma + on-device selection feeding the threaded C++
        # committer) still wins everywhere: CIF 4.4 vs 1.57 fps
        # (per-step XLA op overhead x ~1100 ranks), 1080p 0.350 vs
        # 0.324 (results/1080p.json vs 1080p_device.json), 4K 0.134 vs
        # 0.079 (padded per-rank caps make the scan compute-bound).
        # Override with WRENC_COMMIT_ENGINE=device.
        self.commit_engine = commit_engine or os.environ.get(
            'WRENC_COMMIT_ENGINE', 'native')
        # re-decide modes at commit time on the true reconstruction
        # (the reference's decision discipline, block_splitter.rs:110);
        # stage A then only has to get the candidate list right
        self.rd_commit = rd_commit
        qp = cfg.qp
        self.qp_c = quant.chroma_qp_from_luma(qp)
        self.qpar = {}
        for c_idx in (0, 1):
            q = qp if c_idx == 0 else self.qp_c
            for log2 in (2, 3, 4, 5):
                self.qpar[(c_idx, log2)] = quant.derive_quant_params(
                    q, log2, log2, dep_quant=cfg.dep_quant_enabled,
                    transform_skip=False)
        self.lam_dq_greedy = kq.lam_dq_table(self.rm, qp, trellis=False)
        self.lam_dq_trellis = kq.lam_dq_table(self.rm, qp, trellis=True)
        self.lv_greedy = kq.lv_table_device(self.rm, cfg.dep_quant_enabled,
                                            False)
        self.lv_trellis = kq.lv_table_device(self.rm, cfg.dep_quant_enabled,
                                             True)
        dep = cfg.dep_quant_enabled
        self.lam = 2.0 ** (qp / self.rm.pick('qp_div', dep, True)) \
            * self.rm.pick('lambda_mul', dep, True)
        self._mode_bits = self._approx_mode_bits()
        self.mpm_refine = True
        # weight on the luma mode-bit term in stage-A costs. The legacy
        # pipeline effectively charged mode bits twice (once in the device
        # cost, once at the QT leaf), which measures better than 1x with
        # the reference-tuned rate constants — kept as an explicit,
        # tunable factor now that bits are applied host-side.
        self.mode_bits_scale = getattr(self.rm, 'stage_a_mode_bits_scale',
                                       2.0)
        use_device = (
            self.commit_engine == 'device' and self.rd_commit
            and self.trellis_commit and cfg.dep_quant_enabled
            and getattr(self.rm, 'commit_rank_full', 0)
            and getattr(self.rm, 'commit_rank_trellis', 0)
            and getattr(self.rm, 'commit_chroma_redecide', 0))
        self._device_commit = bool(use_device)
        # chroma stage A engine: 'device' = the fused on-device jit,
        # 'native' = the host C++ call (the f64-combine reference; tests
        # pin one engine to compare from identical trees). Default is
        # resolution-dependent (round 5, VERDICT r4 #6): the device path
        # pays ~0.2-0.4 s/chunk of axon-tunnel round-trip latency, which
        # swamps the tiny CIF host chroma (0.25 s vs 0.75 s measured for
        # 16 frames) but wins at 1080p+, where the host C++ chroma
        # (1.5 s/4-frame chunk) competes with the commit worker for the
        # 2-core host. The device commit engine always uses it (planes
        # already resident). The sharded-mesh stage A does not build
        # dev_planes, so it falls back to native (see the dev_planes
        # guard at the _prefill call site).
        auto_chroma = ('device' if (self._device_commit or
                                    cfg.width * cfg.height >= 1 << 19)
                       else 'native')
        self._chroma_device = (chroma_stage_a or os.environ.get(
            'WRENC_CHROMA_STAGE_A', auto_chroma)) == 'device'
        # luma winner selection (MPM Jacobi + ranking) on device: cuts
        # the stage-A download 40% and removes host_select; 'host' keeps
        # the f64-combining numpy path (the sharded mesh always uses it)
        self._select_device = os.environ.get(
            'WRENC_STAGE_A_SELECT', 'device') == 'device'
        self._refine_margin = self.rm.split_refine_margin

    # ------------------------------------------------------------- stage A
    def _approx_mode_bits(self):
        """Static per-mode luma mode-bits estimate (MPM membership is
        neighbour-dependent; stage A uses the expectation)."""
        rm, dep = self.rm, self.cfg.dep_quant_enabled
        out = np.zeros(67, dtype=np.float32)
        out[0] = rm.pick('planar_offset', dep, True)
        mpm = (1.0 + rm.pick('mpm_idx_offset', dep, True)) ** rm.mpm_idx_pow
        rem = rm.pick('mpm_remainder_mult', dep, True) * \
            (30.0 + rm.pick('mpm_remainder_offset', dep, True)) \
            ** rm.mpm_remainder_pow
        out[1:] = rm.pick('non_planar_offset', dep, True) + \
            0.5 * (mpm + rem)
        return out

    def encode_frame(self, planes):
        return self.encode_frames([planes])[0]

    # fixed stage-A batch buckets: every frame batch is padded up to one of
    # these, so the fused jit compiles at most once per bucket per geometry
    # (a free-running F recompiles per batch size — the round-1 855 s
    # QP22 eval point was exactly that). The cap also makes the chunk
    # pipeline effective: chunk k+1's device stage A overlaps chunk k's
    # host commit. Large frames cap the chunk by a pixel budget so the
    # per-chunk device working set stays bounded (1080p -> 1 frame/chunk).
    BATCH_BUCKETS = (1, 2, 4, 8)
    CHUNK_PIXEL_BUDGET = 3_500_000
    # the device commit engine amortizes its per-rank-step kernel count
    # over the frame batch (frames share one scan), so it wants chunks as
    # large as stage-A working memory allows
    DEVICE_BATCH_BUCKETS = (1, 2, 4, 8, 16)
    DEVICE_CHUNK_PIXEL_BUDGET = 9_000_000

    def _commit_group_frames(self):
        """Frames per commit SCAN (env WRENC_COMMIT_GROUP overrides).

        The rank count is frame-independent, so a larger group divides
        the scan's per-step cost over more frames — but only while the
        steps are op-count-floor-bound. Measured on the real chip
        (round 5): CIF 16/32/64-frame groups run 8.0/8.7/8.6 s scans
        (1.57 -> 2.46 -> 3.51 fps); at 1080p the 16-frame group is
        PATHOLOGICAL (520 ms/step vs 10 ms at 4 frames — peak-cap
        padding and per-step scatter traffic grow superlinearly with
        the batched wavefront, results/1080p_device16.json), so
        1080p+ keeps the 4-frame group that measured best."""
        import os
        env = int(os.environ.get('WRENC_COMMIT_GROUP', 0))
        if env:
            return env
        px = self.cfg.width * self.cfg.height
        return 64 if px <= 524_288 else 4

    def _buckets(self):
        px = self.cfg.width * self.cfg.height
        buckets = (self.DEVICE_BATCH_BUCKETS if self._device_commit
                   else self.BATCH_BUCKETS)
        budget = (self.DEVICE_CHUNK_PIXEL_BUDGET if self._device_commit
                  else self.CHUNK_PIXEL_BUDGET)
        bs = [b for b in buckets if b * px <= budget]
        return bs or [1]

    def encode_frames(self, frames):
        """Chunked batched API: frames are processed in fixed-size stage-A
        batches (padded to a bucket size). The device stage A of chunk k+1
        is dispatched BEFORE the host passes of chunk k run (JAX dispatch
        is asynchronous), so the TPU computes under the host commit; the
        commit of chunk k additionally runs in a worker thread (ctypes /
        device calls release the GIL) under chunk k+1's Python decide
        phase. The device commit engine groups SEVERAL stage-A
        sub-batches into one commit scan (_commit_group_frames): the
        rank-wavefront's step count is per-frame-independent, so a
        larger frame batch amortizes the per-step kernel overhead that
        sets the scan's wall time. Returns [(trees, recon), ...]."""
        self.phase_times = {}
        out = []
        max_b = self._buckets()[-1]
        chunks = [frames[i:i + max_b] for i in range(0, len(frames), max_b)]
        group_n = 1
        commit_frames = self._commit_group_frames()
        if self._device_commit and max_b < commit_frames:
            group_n = max(1, commit_frames // max_b)
        pending = self._dispatch_stage_a(chunks[0])
        from ..entropy import native
        overlap = (len(chunks) > 1
                   and not tuple(getattr(self.cfg, 'qp_delta_pattern', ())
                                 or ())
                   and (self._device_commit or
                        (native.commit_supported()
                         and (not self.rd_commit
                              or native.tree_commit_supported()))))
        if not overlap:
            gb, gt, gd = [], [], []
            for k, chunk in enumerate(chunks):
                nxt = (self._dispatch_stage_a(chunks[k + 1])
                       if k + 1 < len(chunks) else None)
                batch, trees, devp = self._decide_chunk(chunk, pending)
                gb.extend(batch)
                gt.extend(trees)
                gd.append((devp, len(batch)))
                pending = nxt
                if len(chunks) == k + 1 or (k + 1) % group_n == 0:
                    import time as _time
                    t0 = _time.perf_counter()
                    recons = self._commit_all(gt, gb, _merge_devp(gd))
                    self._phase('host_commit',
                                _time.perf_counter() - t0)
                    out.extend(list(zip(gt, recons)))
                    gb, gt, gd = [], [], []
            return out
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=1) as pool:
            prev = None
            gb, gt, gd = [], [], []
            for k, chunk in enumerate(chunks):
                nxt = (self._dispatch_stage_a(chunks[k + 1])
                       if k + 1 < len(chunks) else None)
                batch, trees, devp = self._decide_chunk(chunk, pending)
                gb.extend(batch)
                gt.extend(trees)
                gd.append((devp, len(batch)))
                pending = nxt
                if len(chunks) == k + 1 or (k + 1) % group_n == 0:
                    if prev is not None:
                        out.extend(self._join_commit(prev))
                    timing = {}
                    fut = pool.submit(self._commit_timed, gb, gt, timing,
                                      _merge_devp(gd))
                    prev = (fut, gt, timing)
                    gb, gt, gd = [], [], []
            out.extend(self._join_commit(prev))
        return out

    def _commit_timed(self, batch, all_trees, timing, dev_planes=None):
        import time as _time
        t0 = _time.perf_counter()
        recons = self._commit_all(all_trees, batch, dev_planes)
        timing['work'] = _time.perf_counter() - t0
        return recons

    def _join_commit(self, prev):
        import time as _time
        fut, trees, timing = prev
        t0 = _time.perf_counter()
        recons = fut.result()
        # host_commit = time this thread BLOCKED on the commit (the
        # overlap with the next chunk's decide is hidden);
        # host_commit_work = the commit's own wall time in the worker
        self._phase('host_commit', _time.perf_counter() - t0)
        self._phase('host_commit_work', timing.get('work', 0.0))
        return list(zip(trees, recons))

    def _bucket(self, n):
        bs = self._buckets()
        for b in bs:
            if n <= b:
                return b
        return bs[-1]

    def _phase(self, name, dt):
        if not hasattr(self, 'phase_times'):
            self.phase_times = {}
        self.phase_times[name] = self.phase_times.get(name, 0.0) + dt

    def _dispatch_stage_a(self, frames):
        """Dispatch the fused luma stage A for one chunk; does NOT block.
        Returns (batch, sizes, device result tree)."""
        import time as _time
        cfg = self.cfg
        batch = [[np.asarray(p, dtype=np.int32) for p in planes]
                 for planes in frames]
        F = len(batch)
        Fpad = self._bucket(F)
        padded = batch + [batch[-1]] * (Fpad - F) if Fpad > F else batch
        sizes = [1 << (cfg.log2_ctu_size - d)
                 for d in range(cfg.max_split_depth, -1, -1)]
        # pixels cross the host<->device link as uint8 (the axon tunnel
        # moves ~15 MB/s; uploads were a quarter of stage-A wall at 1080p)
        planes_y = np.stack([b[0] for b in padded]).astype(np.uint8)
        if self.mesh is not None:
            nf = self.mesh.shape.get('frame', 1)
            pad = (-len(planes_y)) % nf
            if pad:
                planes_y = np.concatenate(
                    [planes_y, np.repeat(planes_y[-1:], pad, axis=0)])
        t0 = _time.perf_counter()
        fused = self._fused_luma(len(planes_y), tuple(sizes))
        dev_planes = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            row = 'row' if self.mesh.shape.get('row', 1) > 1 else None
            dev = jax.device_put(
                planes_y, NamedSharding(self.mesh, P('frame', row, None)))
        else:
            dev = jnp.asarray(planes_y)
            if self._device_commit or self._chroma_device:
                # device-resident planes shared by stage A, the fused
                # chroma stage A and (device engine) the commit scan:
                # one upload per chunk serves all of them
                cfg = self.cfg
                cb = np.stack([b[1] for b in padded]).astype(np.uint8)
                cr = np.stack([b[2] for b in padded]).astype(np.uint8)
                F_ = len(padded)
                dev_planes = (
                    dev.reshape(F_, cfg.height * cfg.width),
                    jnp.asarray(cb.reshape(F_, -1)),
                    jnp.asarray(cr.reshape(F_, -1)))
        res = fused(dev)
        self._phase('device_dispatch', _time.perf_counter() - t0)
        return batch, sizes, res, dev_planes

    def _finish_chunk(self, frames, dispatched):
        """Block on a dispatched stage A, then run the host passes
        sequentially (the non-overlapped path)."""
        import time as _time
        batch, all_trees, devp = self._decide_chunk(frames, dispatched)
        t0 = _time.perf_counter()
        recons = self._commit_all(all_trees, batch, devp)
        self._phase('host_commit', _time.perf_counter() - t0)
        return list(zip(all_trees, recons))

    def _decide_chunk(self, frames, dispatched):
        """Block on a dispatched stage A and run the decide phases;
        returns (batch, all_trees) ready for _commit_all."""
        import time as _time
        cfg = self.cfg
        self.batch, sizes, res, dev_planes = dispatched
        F = len(self.batch)
        luma_mode_b = {}
        luma_cost_b = {}
        luma_cands_b = {}
        t0 = _time.perf_counter()
        res = jax.tree_util.tree_map(np.asarray, res)   # block until done
        self._phase('device_stage_a', _time.perf_counter() - t0)
        t0 = _time.perf_counter()
        luma_cand_cost_b = {}
        for s in sizes:
            if len(res[s]) == 3:           # device-side winner selection
                rk, cost, c2 = res[s]
                luma_mode_b[s] = rk[:F, :, 0].astype(np.int64)
                luma_cost_b[s] = cost[:F]
                luma_cands_b[s] = rk[:F].astype(np.int32)
                luma_cand_cost_b[s] = c2[:F]
            else:
                cands, base = res[s]
                (luma_mode_b[s], luma_cost_b[s], luma_cands_b[s],
                 luma_cand_cost_b[s]) = self._select_modes(s, cands[:F],
                                                           base[:F])
        self._phase('host_select', _time.perf_counter() - t0)
        t0 = _time.perf_counter()
        chroma_cache = {}
        if self._chroma_device and dev_planes is not None:
            self._prefill_chroma_device(chroma_cache, luma_mode_b, sizes,
                                        F, dev_planes)
        else:
            self._prefill_chroma_cache(chroma_cache, luma_mode_b, sizes, F)
        self._phase('host_chroma_rd', _time.perf_counter() - t0)
        t0 = _time.perf_counter()
        all_trees = []
        for fi in range(F):
            self.orig = self.batch[fi]
            self.luma_cands = {s: luma_cands_b[s][fi] for s in sizes}
            self.luma_cand_costs = {s: luma_cand_cost_b[s][fi]
                                    for s in sizes}
            trees = self._decide_and_commit(
                {s: luma_mode_b[s][fi] for s in sizes},
                {s: luma_cost_b[s][fi] for s in sizes},
                sizes, fi, luma_mode_b, chroma_cache)
            all_trees.append(trees)
        self._phase('host_decide', _time.perf_counter() - t0)
        return self.batch, all_trees, dev_planes

    def _commit_all(self, all_trees, batch, dev_planes=None):
        """Commit every frame's decisions against true reconstruction.

        Uses the native C++ commit engine (coding-order walk, threaded
        across frames) when available, else the NumPy rank-wavefront path.
        May run in a worker thread (see encode_frames) — the native/device
        branches only touch `batch`/`all_trees`, never chunk-coupled
        instance state.
        """
        cfg = self.cfg
        pat = tuple(getattr(cfg, 'qp_delta_pattern', ()) or ())
        if pat:
            # per-QG QP mode: tag every CU with its CTU's target QpY and
            # commit on the NumPy path (per-CU qpar sub-batching)
            n_cols = cfg.width >> cfg.log2_ctu_size
            for trees in all_trees:
                for cu in self._collect_cus(trees):
                    ci = ((cu.y >> cfg.log2_ctu_size) * n_cols
                          + (cu.x >> cfg.log2_ctu_size))
                    cu.qp_y = int(np.clip(cfg.qp + pat[ci % len(pat)],
                                          0, 63))
            recons = []
            for fi, trees in enumerate(all_trees):
                self.orig = batch[fi]
                recons.append(self._commit(trees))
            return recons
        if self._device_commit:
            from .device_commit import commit_frames_device_rd
            return commit_frames_device_rd(self.cfg, batch, all_trees,
                                           dev_planes)
        from ..entropy import native
        if native.commit_supported():
            ls_tab = np.zeros((2, 4), dtype=np.int32)
            bd_tab = np.zeros((2, 4), dtype=np.int32)
            for c in (0, 1):
                for log2 in (2, 3, 4, 5):
                    qpar = self.qpar[(c, log2)]
                    ls_tab[c, log2 - 2] = qpar.ls
                    bd_tab[c, log2 - 2] = qpar.bd_shift
            lam_dq = (self.lam_dq_trellis if self.trellis_commit
                      else self.lam_dq_greedy)
            if self.rd_commit and native.tree_commit_supported():
                rm, dep = self.rm, self.cfg.dep_quant_enabled
                i = np.arange(1024, dtype=np.float64)
                lv64 = ((i + rm.pick('lv_offset', dep, True))
                        ** rm.pick('lv_pow', dep, True)
                        * 16384.0).astype(np.int64)
                return native.commit_frames_tree_native(
                    self.cfg, batch, all_trees, ls_tab, bd_tab, lam_dq,
                    self.trellis_commit, lv64)
            cu_lists = [self._collect_cus(trees) for trees in all_trees]
            return native.commit_frames_native(
                self.cfg, batch, cu_lists, ls_tab, bd_tab, lam_dq,
                self.trellis_commit)
        recons = []
        for fi, trees in enumerate(all_trees):
            self.orig = batch[fi]
            recons.append(self._commit(trees))
        return recons

    def _decide_and_commit(self, luma_mode, luma_cost, sizes, fi,
                           luma_mode_b, chroma_cache):
        cfg = self.cfg
        W, H = cfg.width, cfg.height
        dep = cfg.dep_quant_enabled
        if self.rd_commit:
            self._prep_cand_matrices(sizes)

        # chroma costs with derived modes (batched across frames, cached)
        hb = self.rm.pick('header_bits', dep, True)
        chb = self.rm.pick('chroma_header_bits', dep, True)
        ncc = (self.rm.pick('non_cclm_offset', dep, True)
               if cfg.cclm_enabled else 0.0)

        # bottom-up QT decision
        min_s = sizes[0]
        cost = None
        split = {}
        refine = {}
        margin = (self._refine_margin if self.rd_commit else 0.0)
        self.cclm_choice = {}
        self.scipu_choice = None
        for s in sizes:
            n_bw, n_bh = W // s, H // s
            lc = luma_cost[s].reshape(n_bh, n_bw)
            lm = luma_mode[s].reshape(n_bh, n_bw)
            if s == 4:
                # dual-tree luma leaves (inside SCIPU): hb/3, no chroma
                # (mode bits are already inside lc, cf. _select_modes)
                leaf = lc + self.lam * (hb / 3.0)
                cost = leaf
                continue
            cs = s // 2
            # single-tree leaf: luma + best-of(derived, CCLM) chroma + bits
            ch = self._chroma_cached(chroma_cache, ('leaf', s), cs,
                                     luma_mode_b[s], fi)
            ch_total = ch + self.lam * ncc
            if cfg.cclm_enabled:
                cc, cm = self._cclm_cached(chroma_cache, cs, fi)
                use = cc < ch_total
                self.cclm_choice[s] = np.where(use, cm, -1)
                ch_total = np.where(use, cc, ch_total)
            leaf = (lc + ch_total.reshape(n_bh, n_bw)
                    + self.lam * hb)
            if cost is None:
                cost = leaf
                split[s] = np.zeros_like(leaf, dtype=bool)
                continue
            agg = (cost[0::2, 0::2] + cost[0::2, 1::2]
                   + cost[1::2, 0::2] + cost[1::2, 1::2])
            if s == 8 and min_s == 4:
                # SCIPU: 4 luma-only children + one chroma CU whose mode is
                # derived from the centre (bottom-right) 4x4 child
                F = len(self.batch)
                cm4 = luma_mode_b[4].reshape(F, H // 4, W // 4)[:, 1::2, 1::2]
                ch_sc = self._chroma_cached(chroma_cache, ('scipu', 8), 4,
                                            cm4.reshape(F, -1), fi)
                sc_total = ch_sc + self.lam * ncc
                if cfg.cclm_enabled:
                    cc, cm = self._cclm_cached(chroma_cache, 4, fi)
                    use = cc < sc_total
                    self.scipu_choice = np.where(use, cm, -1)
                    sc_total = np.where(use, cc, sc_total)
                agg = agg + sc_total.reshape(n_bh, n_bw) + self.lam * chb
            split_here = agg <= leaf
            split[s] = split_here
            if margin > 0:
                refine[s] = (np.abs(agg - leaf)
                             <= margin * np.maximum(np.abs(leaf), 1.0))
            cost = np.where(split_here, agg, leaf)
        # plain Python lists for the tree walk: _build_node touches these
        # ~4.6k times per frame, and per-element numpy scalar indexing +
        # bool()/int() conversions were ~half of host_decide (profiled);
        # one bulk .tolist() per array is a single C pass
        self.split = {s: m.tolist() for s, m in split.items()}
        self.refine = {s: m.tolist() for s, m in refine.items()}
        self.luma_mode = {s: np.asarray(m).tolist()
                          for s, m in luma_mode.items()}
        self.cclm_choice = {s: np.asarray(c).tolist()
                            for s, c in self.cclm_choice.items()}
        if self.scipu_choice is not None:
            self.scipu_choice = np.asarray(self.scipu_choice).tolist()
        return self._assemble_trees()

    def _fused_luma(self, F, sizes):
        """One jit for the whole luma stage A: reference vectors are built
        on device via static substitution gathers (refs.subst_gather), the
        67-mode sweep + SAD prune + greedy RD run per size, and only the
        per-size (mode, cost) arrays come back. One device round-trip per
        frame batch instead of one per size. The jit is cached at module
        level per geometry; QP-dependent scalars/tables are traced
        arguments, so changing QP does NOT recompile."""
        cfg = self.cfg
        K = int(getattr(self.rm, 'stage_a_num_rd_cands', 4))
        tr = bool(getattr(self.rm, 'stage_a_trellis_rd', 0.0))
        sel = self._select_device
        if self.mesh is not None and self.mesh.shape.get('row', 1) > 1:
            run = _fused_luma_sharded_builder(
                cfg.width, cfg.height, cfg.log2_ctu_size, sizes, F, K,
                self.mesh, tr)
            sel = False
        else:
            run = _fused_luma_builder(cfg.width, cfg.height,
                                      cfg.log2_ctu_size, sizes, F, K, tr,
                                      sel)
        ls = {s: np.int32(self.qpar[(0, s.bit_length() - 1)].ls)
              for s in sizes}
        bd = {s: np.int32(self.qpar[(0, s.bit_length() - 1)].bd_shift)
              for s in sizes}
        lam_dq = self.lam_dq_trellis if tr else self.lam_dq_greedy
        lv = self.lv_trellis if tr else self.lv_greedy
        lam = np.float32(self.lam)
        mats = {s: intra_pred.mats_device_f32(s, 0) for s in sizes}
        seltabs = None
        if sel:
            po, idx_bits, rem_bits = _mpm_scalar_tabs(
                self.rm, cfg.dep_quant_enabled)
            seltabs = (np.float32(self.lam * self.mode_bits_scale),
                       np.asarray(self._mode_bits, np.float32), po,
                       idx_bits, rem_bits)

        def call(planes):
            if sel:
                return run(planes, ls, bd, lam_dq, lv, lam, mats, seltabs)
            return run(planes, ls, bd, lam_dq, lv, lam, mats)

        return call

    def _select_modes(self, s, cands, base):
        """Pick the winning luma mode per block from the device candidates.

        base is ssd + lam*rate (no mode bits). Bits are applied here,
        exactly (MPM-dependent): after a provisional pick with the static
        expectation, each block's MPM list is approximated from its left /
        above same-size neighbours' picks and the candidates re-ranked
        (two Jacobi iterations). The returned cost INCLUDES the mode-bit
        term once (the QT decision no longer re-adds it — the old path
        double-counted mode bits there)."""
        F, N, K = cands.shape
        cfg = self.cfg
        n_bw = cfg.width // s
        n_bh = cfg.height // s
        sc = self.lam * self.mode_bits_scale
        bits = self._mode_bits[cands]
        total = base + sc * bits
        best = np.argmin(total, axis=2)
        mode = np.take_along_axis(cands, best[..., None], 2)[..., 0]
        if self.mpm_refine:
            T = _mpm_bits_table(self.rm, cfg.dep_quant_enabled)
            ctu = cfg.ctu_size
            top_rows = (np.arange(n_bh) * s) % ctu == 0
            for _ in range(2):
                g = mode.reshape(F, n_bh, n_bw)
                lm = np.zeros_like(g)
                lm[:, :, 1:] = g[:, :, :-1]
                am = np.zeros_like(g)
                am[:, 1:, :] = g[:, :-1, :]
                am[:, top_rows, :] = 0       # above-CTU-row not usable
                bits = T[lm.reshape(F, N)[..., None],
                         am.reshape(F, N)[..., None], cands]
                total = base + sc * bits
                best = np.argmin(total, axis=2)
                mode = np.take_along_axis(cands, best[..., None], 2)[..., 0]
        cost = np.take_along_axis(total, best[..., None], 2)[..., 0]
        # candidate list for commit-time re-decision, ranked by stage-A cost
        order = np.argsort(total, axis=2)
        ranked = np.take_along_axis(cands, order, axis=2)
        ranked_cost = np.take_along_axis(total, order, axis=2)
        return (mode.astype(np.int64), cost, ranked.astype(np.int32),
                ranked_cost)

    def _prefill_chroma_cache(self, cache, luma_mode_b, sizes, F):
        """Compute all chroma stage-A costs in one native host call
        (wrenc_chroma_stage_a) instead of per-size device round-trips.
        Numerically identical RD (same greedy decisions and float32 rate
        accumulation); falls back to the device path when no native lib."""
        from ..entropy import native
        if not native.available():
            return
        cfg = self.cfg
        W, H = cfg.width, cfg.height
        dmodes = {}
        for cs in (4, 8, 16):
            s = 2 * cs
            dmodes[cs] = luma_mode_b[s] if s in sizes else None
        scipu_modes = None
        if 4 in sizes and 8 in sizes:
            scipu_modes = luma_mode_b[4].reshape(
                F, H // 4, W // 4)[:, 1::2, 1::2].reshape(F, -1)
        ls_c = [self.qpar[(1, lg)].ls for lg in (2, 3, 4)]
        bd_c = [self.qpar[(1, lg)].bd_shift for lg in (2, 3, 4)]
        res = native.chroma_stage_a_native(
            cfg, self.batch, dmodes, scipu_modes, ls_c, bd_c,
            self.lam_dq_greedy, self.lv_greedy)
        lam = self.lam
        dep = cfg.dep_quant_enabled

        def combine(ssd, rate):
            c = ssd.astype(np.float64) + lam * rate.astype(np.float64) \
                / 16384.0
            return c[..., 0] + c[..., 1]

        for cs in (4, 8, 16):
            if ('d', cs) in res:
                cache[('leaf', 2 * cs)] = combine(*res[('d', cs)])
        if ('sc',) in res:
            cache[('scipu', 8)] = combine(*res[('sc',)])
        if cfg.cclm_enabled:
            co = self.rm.pick('cclm_offset', dep, True)
            cio = self.rm.pick('cclm_mode_idx_offset', dep, True)
            bits = np.array([co + (i + cio) ** self.rm.cclm_pow
                             for i in range(3)])
            for cs in (4, 8, 16):
                if ('cc', cs) not in res:
                    continue
                c = combine(*res[('cc', cs)])          # (F, 3, N)
                c = c + (lam * bits)[None, :, None]
                best = np.argmin(c, axis=1)
                cost = np.take_along_axis(c, best[:, None, :], axis=1)[:, 0]
                cache[('cclm', cs)] = (cost, (81 + best).astype(np.int32))

    def _prefill_chroma_device(self, cache, luma_mode_b, sizes, F,
                               dev_planes):
        """Chroma stage A fully on device in ONE fused jit (derived +
        CCLM + SCIPU costs for every size) — replaces the native host
        call for the device pipeline; see _fused_chroma_builder."""
        cfg = self.cfg
        css = tuple(sorted(s // 2 for s in sizes if s >= 8))
        scipu = 4 in sizes and 8 in sizes
        Fp = int(dev_planes[0].shape[0])
        tr = bool(getattr(self.rm, 'stage_a_trellis_rd', 0.0))
        run = _fused_chroma_builder(cfg.width, cfg.height,
                                    cfg.log2_ctu_size, css, Fp,
                                    bool(cfg.cclm_enabled), scipu, tr)

        def padF(a):
            a = np.asarray(a, np.int32)
            if a.shape[0] < Fp:
                a = np.concatenate([a] + [a[-1:]] * (Fp - a.shape[0]))
            return a

        dmodes = {cs: padF(luma_mode_b[2 * cs]) for cs in css}
        if scipu:
            W, H = cfg.width, cfg.height
            sm = luma_mode_b[4].reshape(
                -1, H // 4, W // 4)[:, 1::2, 1::2].reshape(
                    luma_mode_b[4].shape[0], -1)
            scipu_modes = padF(sm)
        else:
            scipu_modes = np.zeros((Fp, 1), np.int32)
        ls_c = np.array([self.qpar[(1, lg)].ls for lg in (2, 3, 4)],
                        np.int32)
        bd_c = np.array([self.qpar[(1, lg)].bd_shift for lg in (2, 3, 4)],
                        np.int32)
        dep = cfg.dep_quant_enabled
        co = self.rm.pick('cclm_offset', dep, True)
        cio = self.rm.pick('cclm_mode_idx_offset', dep, True)
        bits = np.float32([co + (i + cio) ** self.rm.cclm_pow
                           for i in range(3)])
        mats = {('c', cs): intra_pred.mats_device_f32(cs, 1) for cs in css}
        lam_dq = self.lam_dq_trellis if tr else self.lam_dq_greedy
        lv = self.lv_trellis if tr else self.lv_greedy
        res = run(dev_planes[0], dev_planes[1], dev_planes[2], dmodes,
                  scipu_modes, ls_c, bd_c, jnp.asarray(lam_dq),
                  jnp.asarray(lv), np.float32(self.lam), bits, mats)
        res = jax.tree_util.tree_map(np.asarray, res)
        for cs in css:
            if ('d', cs) in res:
                cache[('leaf', 2 * cs)] = \
                    res[('d', cs)][:F].astype(np.float64)
            if cs == 4 and ('sc', cs) in res:
                cache[('scipu', 8)] = res[('sc', cs)][:F].astype(np.float64)
            if ('cc', cs) in res:
                best, pick = res[('cc', cs)]
                cache[('cclm', cs)] = (best[:F].astype(np.float64),
                                       (81 + pick[:F]).astype(np.int32))

    def _chroma_cached(self, cache, key, cs, modes_b, fi):
        if key not in cache:
            cache[key] = self._stage_a_chroma_batch(cs, modes_b)
        return cache[key][fi]

    def _cclm_cached(self, cache, cs, fi):
        key = ('cclm', cs)
        if key not in cache:
            cache[key] = self._stage_a_cclm_batch(cs)
        cc, cm = cache[key]
        return cc[fi], cm[fi]

    def _stage_a_cclm_batch(self, cs):
        """Best-CCLM chroma cost per block (cb+cr, greedy RD on original
        planes) for all frames. Returns (costs (F, N), modes (F, N))."""
        cfg = self.cfg
        W, H = cfg.width, cfg.height
        log2 = cs.bit_length() - 1
        F = len(self.batch)
        xs, ys = refs.block_grid(W, H, cs, 1)
        masks = refs.avail_masks(W, H, cs, 1, cfg.log2_ctu_size)
        N = len(xs)
        qpar = self.qpar[(1, log2)]
        dep = cfg.dep_quant_enabled
        co = self.rm.pick('cclm_offset', dep, True)
        cio = self.rm.pick('cclm_mode_idx_offset', dep, True)
        mode_bits = np.array([co + (i + cio) ** self.rm.cclm_pow
                              for i in range(3)])
        n_bw = (W // 2) // cs
        preds, origs = [], []
        for planes in self.batch:
            for c_idx in (1, 2):
                blk = planes[c_idx].reshape((H // 2) // cs, cs, n_bw, cs) \
                    .transpose(0, 2, 1, 3).reshape(-1, cs, cs)
                for m in (81, 82, 83):
                    preds.append(np_ops.predict_cclm_np(
                        m, planes[0], planes[c_idx], xs, ys, cs, masks,
                        cfg.ctu_size))
                    origs.append(blk)
        pred = np.concatenate(preds)          # (F*2*3*N, cs, cs)
        orig = np.concatenate(origs)
        ssd, rate = _rd_eval(jnp.asarray(pred), jnp.asarray(orig),
                             qpar.ls, qpar.bd_shift,
                             jnp.asarray(self.lam_dq_greedy),
                             jnp.asarray(self.lv_greedy), log2)
        c = (np.asarray(ssd).astype(np.float64)
             + self.lam * np.asarray(rate) / 16384.0).reshape(F, 2, 3, N)
        c = c.sum(axis=1) + (self.lam * mode_bits)[None, :, None]  # (F,3,N)
        best = np.argmin(c, axis=1)                                # (F,N)
        cost = np.take_along_axis(c, best[:, None, :], axis=1)[:, 0]
        return cost, (81 + best).astype(np.int32)

    def _stage_a_chroma_batch(self, cs, modes_b):
        """Chroma RD cost (cb+cr), all frames in one device call per comp.

        modes_b: (F, N) derived modes. Returns (F, N) costs."""
        cfg = self.cfg
        W, H = cfg.width, cfg.height
        log2 = cs.bit_length() - 1
        F, N = modes_b.shape
        total = None
        for c_idx in (1, 2):
            vs, blks = [], []
            n_bw = (W // 2) // cs
            for planes in self.batch:
                u, xs, ys = refs.build_ref_vectors(planes[c_idx], W, H, cs, 1,
                                                   cfg.log2_ctu_size)
                vs.append(intra_pred.make_v(u, cs))
                blks.append(planes[c_idx].reshape((H // 2) // cs, cs, n_bw, cs)
                            .transpose(0, 2, 1, 3).reshape(-1, cs * cs))
            v = np.concatenate(vs)
            blocks = np.concatenate(blks)
            qpar = self.qpar[(1, log2)]
            pred = intra_pred.predict_modes(
                jnp.asarray(v), jnp.asarray(modes_b.ravel(), dtype=np.int32),
                cs, 1)
            ssd, rate = _rd_eval(pred.reshape(-1, cs, cs),
                                 jnp.asarray(blocks.reshape(-1, cs, cs)),
                                 qpar.ls, qpar.bd_shift,
                                 jnp.asarray(self.lam_dq_greedy),
                                 jnp.asarray(self.lv_greedy), log2)
            c = np.asarray(ssd).astype(np.float64) \
                + self.lam * np.asarray(rate) / 16384.0
            total = c if total is None else total + c
        return total.reshape(F, N)

    # ----------------------------------------------------- tree assembly
    def _assemble_trees(self):
        cfg = self.cfg
        W, H = cfg.width, cfg.height
        cs = cfg.ctu_size
        trees = []
        for cy in range(0, H, cs):
            for cx in range(0, W, cs):
                trees.append(self._build_node(cx, cy, cfg.log2_ctu_size,
                                              0, 'S', 'ALL'))
        return trees

    def _prep_cand_matrices(self, sizes):
        """Vectorised commit candidate lists per size: ranked stage-A
        candidates + the +-1 probes around the best angular (the reference
        step search's final refinement, block_splitter.rs:905-974), with
        confident blocks pruned to the winner alone. -1 pads. Replaces a
        per-leaf Python loop that dominated host_decide."""
        self.cand_mat = {}
        prune = getattr(self.rm, 'rd_commit_prune_margin', 0.0)
        for s in sizes:
            cands = np.asarray(self.luma_cands[s])        # (N, K) ranked
            costs = np.asarray(self.luma_cand_costs[s])
            N, K = cands.shape
            out = np.full((N, K + 2), -1, np.int32)
            out[:, :K] = cands
            has_ang = cands >= 2
            first = np.argmax(has_ang, axis=1)
            ang = cands[np.arange(N), first]
            valid = has_ang.any(axis=1)
            for d, col in ((-1, K), (1, K + 1)):
                nb = ang + d
                ok = (valid & (nb >= 2) & (nb <= 66)
                      & ~(cands == nb[:, None]).any(axis=1))
                out[ok, col] = nb[ok]
            if prune > 0 and K > 1:
                pr = (costs[:, 1] - costs[:, 0]
                      > prune * np.maximum(np.abs(costs[:, 0]), 1.0))
                out[pr, 1:] = -1
            self.cand_mat[s] = out

    def _make_leaf_cu(self, x, y, log2, tree, s):
        idx = (y // s) * (self.cfg.width // s) + x // s
        m = int(self.luma_mode[s][idx])
        cmode = m
        if tree == 'S' and s in self.cclm_choice:
            cc = int(self.cclm_choice[s][idx])
            if cc >= 0:
                cmode = cc
        cu = CuDecision(x, y, log2, tree, luma_mode=m,
                        chroma_mode=(cmode if tree == 'S' else 0))
        if self.rd_commit:
            cu.cands = self.cand_mat[s][idx]   # fixed-width row, -1 padded
        return cu

    def _build_node(self, x, y, log2, cqt_depth, tree, mode_type):
        s = 1 << log2
        node = CtNode(x, y, log2, cqt_depth, tree, mode_type)
        min_log2 = self.cfg.log2_ctu_size - self.cfg.max_split_depth
        do_split = (log2 > min_log2
                    and bool(self.split[s][y // s][x // s]))
        do_refine = (tree == 'S' and log2 > min_log2 and s in self.refine
                     and bool(self.refine[s][y // s][x // s]))
        if do_refine:
            node.refine = True
            node.alt_cu = self._make_leaf_cu(x, y, log2, tree, s)
            do_split = True
        if do_split:
            node.split = True
            half = s >> 1
            scipu = (tree == 'S' and s == 8 and self.cfg.chroma_format == 1)
            for i in range(4):
                bx, by = x + (i % 2) * half, y + (i // 2) * half
                node.children.append(self._build_node(
                    bx, by, log2 - 1, cqt_depth + 1,
                    'L' if scipu else tree, 'INTRA' if scipu else mode_type))
            if scipu:
                ch = CtNode(x, y, log2, cqt_depth, 'C', 'INTRA')
                center = int(self.luma_mode[4][(y // 4 + 1) * (self.cfg.width // 4)
                                               + (x // 4 + 1)])
                if self.scipu_choice is not None:
                    idx = (y // 8) * (self.cfg.width // 8) + x // 8
                    cc = int(self.scipu_choice[idx])
                    if cc >= 0:
                        center = cc
                ch.cu = CuDecision(x, y, log2, 'C', luma_mode=0,
                                   chroma_mode=center)
                node.children.append(ch)
        else:
            node.cu = self._make_leaf_cu(x, y, log2, tree, s)
        return node

    # ------------------------------------------------------------- commit
    def _collect_cus(self, trees):
        out = []
        def walk(n):
            if n.split:
                for c in n.children:
                    walk(c)
            else:
                out.append(n.cu)
        for t in trees:
            if t.split:
                for c in t.children:
                    walk(c)
            elif t.cu is not None:
                out.append(t.cu)
            # SCIPU chroma node appears in children; handled by walk
        return out

    def _commit(self, trees):
        cfg = self.cfg
        W, H = cfg.width, cfg.height
        recon = [np.zeros((H, W), dtype=np.int32),
                 np.zeros((H // 2, W // 2), dtype=np.int32),
                 np.zeros((H // 2, W // 2), dtype=np.int32)]
        cus = self._collect_cus(trees)

        # dependency ranks over 4x4 cells
        rank_grid = np.zeros((H // 4, W // 4), dtype=np.int32)
        ranks = np.zeros(len(cus), dtype=np.int32)
        for i, cu in enumerate(cus):
            s = 1 << cu.log2
            x4, y4, n4 = cu.x // 4, cu.y // 4, max(s // 4, 1)
            r = 0
            if cu.x > 0:
                col = rank_grid[max(y4 - 1, 0):min(y4 + 2 * n4, H // 4),
                                x4 - 1]
                if col.size:
                    r = max(r, int(col.max()))
            if cu.y > 0:
                row = rank_grid[y4 - 1,
                                max(x4 - 1, 0):min(x4 + 2 * n4, W // 4)]
                if row.size:
                    r = max(r, int(row.max()))
            # own region: nonzero only for the SCIPU chroma CU (its luma
            # children share these cells) — CCLM reads their co-located
            # luma reconstruction, so it must commit after them
            own = rank_grid[y4:y4 + n4, x4:x4 + n4]
            if own.size:
                r = max(r, int(own.max()))
            ranks[i] = r + 1
            # max, not assignment: the SCIPU chroma CU shares cells with its
            # luma children and must not lower their recorded ranks
            region = rank_grid[y4:y4 + n4, x4:x4 + n4]
            rank_grid[y4:y4 + n4, x4:x4 + n4] = np.maximum(region, ranks[i])

        order = np.argsort(ranks, kind='stable')
        groups = {}
        for i in order:
            cu = cus[i]
            groups.setdefault((int(ranks[i]), cu.log2, cu.tree), []).append(cu)

        for (rank, log2, tree) in sorted(groups.keys()):
            batch = groups[(rank, log2, tree)]
            if tree in ('S', 'L'):
                self._commit_comp(batch, 0, log2, recon)
            if tree in ('S', 'C'):
                self._commit_comp(batch, 1, log2 - 1, recon)
                self._commit_comp(batch, 2, log2 - 1, recon)
        return recon

    def _commit_comp(self, batch, c_idx, log2, recon):
        cfg = self.cfg
        W, H = cfg.width, cfg.height
        s = 1 << log2
        sh = 0 if c_idx == 0 else 1
        xs = np.array([cu.x >> sh for cu in batch], dtype=np.int64)
        ys = np.array([cu.y >> sh for cu in batch], dtype=np.int64)
        masks_all = refs.avail_masks(W, H, s, 0 if c_idx == 0 else 1,
                                     cfg.log2_ctu_size)
        n_bw = (W >> sh) // s
        midx = (ys // s) * n_bw + (xs // s)
        masks = masks_all[midx]
        modes = np.array([cu.luma_mode if c_idx == 0 else cu.chroma_mode
                          for cu in batch], dtype=np.int64)
        is_cclm = modes >= 81
        pred = np.zeros((len(batch), s, s), dtype=np.int32)
        norm = np.where(~is_cclm)[0]
        if norm.size:
            u = refs.gather_u(recon[c_idx], xs[norm], ys[norm], s)
            u = refs.substitute(u, masks[norm], s)
            v = intra_pred.make_v(u, s)
            pred[norm] = np_ops.predict_modes_np(
                v, modes[norm], s, 0 if c_idx == 0 else 1).reshape(-1, s, s)
        for m in (81, 82, 83):
            sel = np.where(modes == m)[0]
            if sel.size:
                pred[sel] = np_ops.predict_cclm_np(
                    m, recon[0], recon[c_idx], xs[sel], ys[sel], s,
                    masks[sel], cfg.ctu_size)
        org = np.stack([self.orig[c_idx][y:y + s, x:x + s]
                        for x, y in zip(xs, ys)])
        res = org - pred
        t = np_ops.forward_dct2_np(res)
        lam_dq = np.asarray(self.lam_dq_trellis if self.trellis_commit
                            else self.lam_dq_greedy)
        # per-CU quant params: fixed-QP uses the precomputed pair; the
        # qp_delta_pattern toy mode sub-batches by each CU's target QpY
        # (lam_dq stays at the base QP — level choice is an RD matter,
        # conformance only needs quantize/dequantize at the signalled QP)
        qp_cu = np.array([getattr(cu, 'qp_y', -1) if
                          getattr(cu, 'qp_y', None) is not None else -1
                          for cu in batch])
        if (qp_cu >= 0).any():
            qpars = {}
            for uq in np.unique(qp_cu):
                qq = cfg.qp if uq < 0 else int(uq)
                if c_idx != 0:
                    qq = quant.chroma_qp_from_luma(qq)
                qpars[uq] = quant.derive_quant_params(
                    qq, log2, log2, dep_quant=cfg.dep_quant_enabled,
                    transform_skip=False)
        else:
            qpars = {-1: self.qpar[(min(c_idx, 1), log2)]}
            qp_cu = np.full(len(batch), -1)
        q = np.zeros_like(t)
        d = np.zeros_like(t)
        from ..entropy import native
        for uq, qpar in qpars.items():
            sel = np.where(qp_cu == uq)[0]
            ts = t[sel]
            if cfg.dep_quant_enabled:
                if native.available():
                    fn = (native.trellis_quant_native if self.trellis_commit
                          else native.greedy_quant_native)
                    qs = fn(ts, qpar.ls, qpar.bd_shift, lam_dq, log2)
                elif self.trellis_commit:
                    qs = np_ops.trellis_depquant_np(ts, qpar.ls,
                                                    qpar.bd_shift,
                                                    lam_dq, log2)
                else:
                    qs = np_ops.greedy_depquant_np(ts, qpar.ls,
                                                   qpar.bd_shift,
                                                   lam_dq, log2)
            else:
                qs = np.stack([quant.quantize_rdoq_off(tt, qpar)
                               for tt in ts])
            q[sel] = qs
            d[sel] = np_ops.dequantize_np(qs, qpar.ls, qpar.bd_shift)
        r = np_ops.inverse_dct2_np(d)
        rec = np.clip(pred + r, 0, 255)
        for i, cu in enumerate(batch):
            recon[c_idx][ys[i]:ys[i] + s, xs[i]:xs[i] + s] = rec[i]
            cu.coeffs[c_idx] = q[i]


def _merge_devp(gd):
    """Concatenate per-sub-batch device planes ((y, cb, cr) uint8, padded
    to the stage-A bucket) into one commit-group set; None if any
    sub-batch lacks them."""
    if any(d is None for d, n in gd):
        return None
    if len(gd) == 1:
        d, n = gd[0]
        return tuple(p[:n] for p in d)
    return tuple(
        jnp.concatenate([d[i][:n] for d, n in gd]) for i in range(3))


_MPM_BITS_CACHE = {}


def _mpm_bits_table(rm, dep):
    """(67, 67, 67) f32 table: mode-bit estimate for coding `mode` given
    left/above neighbour modes (l, a) — the exact rate-model formula the
    scalar encoder evaluates per CU (spec/encoder.py _mode_bits), closed
    over all (l, a) pairs so stage A can apply it with pure indexing."""
    po = rm.pick('planar_offset', dep, True)
    npo = rm.pick('non_planar_offset', dep, True)
    mio = rm.pick('mpm_idx_offset', dep, True)
    mrm = rm.pick('mpm_remainder_mult', dep, True)
    mro = rm.pick('mpm_remainder_offset', dep, True)
    key = (po, npo, mio, mrm, mro, rm.mpm_idx_pow, rm.mpm_remainder_pow)
    if key in _MPM_BITS_CACHE:
        return _MPM_BITS_CACHE[key]
    from ..entropy.syntax import derive_mpm_list
    modes = np.arange(67, dtype=np.float64)
    T = np.empty((67, 67, 67), dtype=np.float32)
    for l in range(67):
        for a in range(67):
            cand = derive_mpm_list(l, a)
            srt = np.sort(cand)
            rem = modes - 1 - np.searchsorted(srt, modes, side='left')
            row = npo + mrm * (rem + mro) ** rm.mpm_remainder_pow
            for idx, m in reversed(list(enumerate(cand))):
                row[m] = npo + (idx + mio) ** rm.mpm_idx_pow
            row[0] = po
            T[l, a] = row
    _MPM_BITS_CACHE[key] = T
    return T


# ------------------------------------------------------------ jit helpers
def _sel_w_split(modes, Wm, bits=8):
    """Per-block prediction-matrix rows W[modes] (N, L, P) via TWO
    one-hot bf16 MXU contractions over signed 8-bit pieces — a direct
    per-row gather of the (67, L, P) matrix lowers to a scalar loop.
    Exact: lo pieces in [0, 256), hi in [-2^7ish, 2^7ish], one-hot rows
    select a single element, f32 accumulation of one term."""
    M, L, P = Wm.shape
    w = Wm.astype(jnp.int32)
    lo = w & ((1 << bits) - 1)
    hi = (w - lo) >> bits
    hot = (modes[:, None] == jnp.arange(M, dtype=jnp.int32)
           ).astype(jnp.bfloat16)
    flat_lo = lo.astype(jnp.bfloat16).reshape(M, L * P)
    flat_hi = hi.astype(jnp.bfloat16).reshape(M, L * P)
    glo = jnp.einsum('nm,mq->nq', hot, flat_lo,
                     preferred_element_type=jnp.float32)
    ghi = jnp.einsum('nm,mq->nq', hot, flat_hi,
                     preferred_element_type=jnp.float32)
    return (ghi.astype(jnp.int32).reshape(-1, L, P) << bits) \
        + glo.astype(jnp.int32).reshape(-1, L, P)


@functools.lru_cache(maxsize=None)
def _fused_chroma_builder(W, H, log2_ctu, css, F, cclm, scipu,
                          trellis=False):
    """One jit for the whole chroma stage A on device: for every chroma
    size cs in `css`, derived-mode greedy RD cost per block (cb+cr) and —
    when cclm — the three CCLM candidates' costs, all from the ORIGINAL
    planes (stage-A discipline), combined in f32 on device. Replaces the
    native host chroma_stage_a call for the device pipeline (VERDICT r3
    item 5: host_chroma_rd was the next ceiling after commit). Returns
    per size: cost_d (F, N), and (cclm) best cost (F, N) + pick (F, N)
    int8; plus the SCIPU variant at cs=4.

    Same greedy decisions and f32 rate accumulation as the native path;
    the final cost combine is f32 (vs f64 on host), so rare near-ties in
    the QT/CCLM choices may differ — equally coded either way."""
    hw = (H // 2) * (W // 2)

    consts = {}
    for cs in css:
        src, fill = refs.subst_gather(W, H, cs, 1, log2_ctu)
        pi, ni, keep = refs.filter121_indices(cs)
        masks = refs.avail_masks(W, H, cs, 1, log2_ctu)
        xs, ys = refs.block_grid(W, H, cs, 1)
        consts[cs] = (src.astype(np.int32), fill, pi, ni, keep,
                      masks, xs.astype(np.int32), ys.astype(np.int32))

    def eval_rd(pred, orig, ls, bd, lam_dq, lv, lgc, lam):
        ssd, rate = _rd_eval_inner(pred.reshape(-1, 1 << lgc, 1 << lgc),
                                   orig.reshape(-1, 1 << lgc, 1 << lgc),
                                   ls, bd, lam_dq, lv, lgc, trellis)
        return ssd + lam * (rate / 16384.0)

    def run(py, pcb, pcr, dmodes, scipu_modes, ls_c, bd_c, lam_dq, lv,
            lam, cclm_bits, mats):
        py = py.astype(jnp.int32)
        pcb = pcb.astype(jnp.int32)
        pcr = pcr.astype(jnp.int32)
        out = {}
        for cs in css:
            src, fill, pi, ni, keep, masks, xs, ys = consts[cs]
            lgc = cs.bit_length() - 1
            N = src.shape[0]
            ls, bd = ls_c[lgc - 2], bd_c[lgc - 2]
            m = mats[('c', cs)]
            # block pixels via reshape (aligned grid tiles the plane)
            n_bw = (W // 2) // cs

            def blocks(p):
                return p.reshape(F, (H // 2) // cs, cs, n_bw, cs) \
                    .transpose(0, 1, 3, 2, 4).reshape(F * N, cs * cs)

            ob = blocks(pcb)
            orr = blocks(pcr)

            def build_v(plane):
                u = jnp.where(jnp.asarray(fill)[None, :, None], 128,
                              plane.reshape(F, -1)[:, jnp.asarray(src)])
                u = u.reshape(-1, src.shape[1])
                uf = jnp.where(jnp.asarray(keep)[None, :], u,
                               (u[:, jnp.asarray(pi)] + 2 * u
                                + u[:, jnp.asarray(ni)] + 2) >> 2)
                return jnp.concatenate([u, uf], axis=1)

            vcb = build_v(pcb)
            vcr = build_v(pcr)

            def pred_modes(v, modes_fn):
                # modes_fn (F*N,) -> (F*N, cs*cs) single-mode prediction
                W1s = _sel_w_split(modes_fn, m['W1'].astype(jnp.int32))
                W2s = _sel_w_split(modes_fn, m['W2'].astype(jnp.int32))
                vf = v.astype(jnp.float32)
                x1 = jnp.einsum('nl,nlp->np', vf,
                                W1s.astype(jnp.float32),
                                preferred_element_type=jnp.float32,
                                precision=transforms.EXACT
                                ).astype(jnp.int32)
                c1 = _dev_sel(m['c1'], modes_fn)[:, None]
                s1 = _dev_sel(m['s1'], modes_fn)[:, None]
                cl1 = _dev_sel(m['clamp1'].astype(jnp.int32),
                               modes_fn)[:, None]
                p1 = (x1 + c1) >> s1
                p1 = jnp.where(cl1 != 0, jnp.clip(p1, 0, 255), p1)
                x2 = jnp.einsum('nl,nlp->np', vf,
                                W2s.astype(jnp.float32),
                                preferred_element_type=jnp.float32,
                                precision=transforms.EXACT
                                ).astype(jnp.int32)
                B2s = _sel_w_split(modes_fn, m['B2'].astype(jnp.int32)
                                   [:, None, :])[:, 0, :]
                p2 = (x2 + B2s * p1 + 32) >> 6
                return jnp.clip(p2, 0, 255)

            def derived_cost(modes_b, tag):
                mf = modes_b.astype(jnp.int32).reshape(-1)
                c = (eval_rd(pred_modes(vcb, mf), ob, ls, bd, lam_dq, lv,
                             lgc, lam)
                     + eval_rd(pred_modes(vcr, mf), orr, ls, bd, lam_dq,
                               lv, lgc, lam))
                out[(tag, cs)] = c.reshape(F, N)

            if cs in dmodes:
                derived_cost(dmodes[cs], 'd')
            if cs == 4 and scipu:
                derived_cost(scipu_modes, 'sc')
            if cclm:
                lx = jnp.asarray(2 * xs)
                ly = jnp.asarray(2 * ys)
                bfl = jnp.repeat(jnp.arange(F, dtype=jnp.int32), N)
                lxB = jnp.tile(lx, F)
                lyB = jnp.tile(ly, F)
                own = py.reshape(F, (H // 2) // cs, 2 * cs, n_bw, 2 * cs) \
                    .transpose(0, 1, 3, 2, 4).reshape(F * N, 2 * cs,
                                                      2 * cs)
                TS, LS, LC = intra_pred.cclm_strips(
                    py.reshape(F, -1), lxB, lyB, cs, H, W, bfl)
                ctb, clb = intra_pred.cclm_cstrips(
                    pcb.reshape(F, -1), jnp.tile(jnp.asarray(xs), F),
                    jnp.tile(jnp.asarray(ys), F), cs, H // 2, W // 2, bfl)
                ctr, clr = intra_pred.cclm_cstrips(
                    pcr.reshape(F, -1), jnp.tile(jnp.asarray(xs), F),
                    jnp.tile(jnp.asarray(ys), F), cs, H // 2, W // 2, bfl)
                mk6 = jnp.tile(jnp.asarray(masks), (3 * F, 1))
                B1 = F * N

                def bc3(a):
                    return jnp.broadcast_to(a[None], (3,) + a.shape) \
                        .reshape((3 * B1,) + a.shape[1:])

                m3 = jnp.repeat(jnp.arange(81, 84, dtype=jnp.int32), B1)
                cc = None
                for comp, (ct_, cl_, oc) in enumerate(
                        ((ctb, clb, ob), (ctr, clr, orr))):
                    p3 = intra_pred.cclm_from_own(
                        m3, bc3(own), bc3(LC), bc3(TS), bc3(LS),
                        bc3(ct_), bc3(cl_), mk6, jnp.tile(lyB, 3),
                        cs, 1 << log2_ctu)
                    c3 = eval_rd(p3.reshape(3 * B1, -1),
                                 jnp.broadcast_to(oc[None], (3,) + oc.shape
                                                  ).reshape(3 * B1, -1),
                                 ls, bd, lam_dq, lv, lgc, lam)
                    cc = c3 if cc is None else cc + c3
                cc = cc.reshape(3, F, N) + lam * cclm_bits[:, None, None]
                pick = jnp.argmin(cc, axis=0)
                best = jnp.min(cc, axis=0)
                out[('cc', cs)] = (best, pick.astype(jnp.int8))
        return out

    return jax.jit(run)


def _dev_sel(tab, idx):
    """(M,) table select by (N,) idx via one-hot sum (values small)."""
    hot = idx[:, None] == jnp.arange(tab.shape[0], dtype=jnp.int32)
    return jnp.sum(jnp.where(hot, jnp.asarray(tab)[None, :], 0), axis=1)


def _mpm_list_dev(l, a):
    """jnp replica of entropy.syntax.derive_mpm_list over (N,) int32
    vectors (spec 8.4.2; ctu.rs:1530-1601). Pure integer logic — agrees
    with the scalar host function for every (l, a) pair (unit-tested)."""
    mn, mx = jnp.minimum(l, a), jnp.maximum(l, a)
    d = mx - mn

    def m64(x, k):
        return 2 + (x + k) % 64

    st = lambda *cols: jnp.stack(cols, axis=-1)
    A = st(l, m64(l, 61), m64(l, -1), m64(l, 60), m64(l, 0))
    B1 = st(l, a, m64(mn, 61), m64(mx, -1), m64(mn, 60))
    B2 = st(l, a, m64(mn, -1), m64(mx, 61), m64(mn, 0))
    B3 = st(l, a, m64(mn, -1), m64(mn, 61), m64(mx, -1))
    B4 = st(l, a, m64(mn, 61), m64(mn, -1), m64(mx, 61))
    C = st(mx, m64(mx, 61), m64(mx, -1), m64(mx, 60), m64(mx, 0))
    D = jnp.broadcast_to(jnp.array([1, 50, 18, 46, 54], jnp.int32),
                         l.shape + (5,))
    d_ = d[..., None]
    B = jnp.where(d_ == 1, B1,
                  jnp.where(d_ >= 62, B2, jnp.where(d_ == 2, B3, B4)))
    diff = (l != a)[..., None]
    any_ang = ((l > 1) | (a > 1))[..., None]
    return jnp.where(((l == a) & (l > 1))[..., None], A,
                     jnp.where(diff & any_ang & (mn > 1)[..., None], B,
                               jnp.where(diff & any_ang, C, D)))


def _bits_dev(cands, C, po, idx_bits, rem_bits):
    """Mode-bit estimate for each candidate given the (.., 5) MPM list —
    the device replica of _mpm_bits_table's per-(l, a) row construction.
    po/idx_bits/rem_bits are host-precomputed in f64 (bit-identical
    values to the host table); lookups are one-hot sums (a per-element
    gather over a minor axis lowers to a scalar loop on TPU)."""
    cm = cands[..., None] == C[..., None, :]              # (.., K, 5)
    has = cm.any(-1)
    fi = jnp.argmax(cm, -1)                                # first index
    ib = jnp.sum(jnp.where(
        fi[..., None] == jnp.arange(5), idx_bits, 0.0), -1)
    cnt = jnp.sum(C[..., None, :] < cands[..., None], -1)
    rem = jnp.clip(cands - 1 - cnt, 0, rem_bits.shape[0] - 1)
    rb = jnp.sum(jnp.where(
        rem[..., None] == jnp.arange(rem_bits.shape[0]), rem_bits,
        0.0), -1)
    return jnp.where(cands == 0, po, jnp.where(has, ib, rb))


def _select_modes_dev(base, cands, nbh, nbw, top_mask, sc, mb67, po,
                      idx_bits, rem_bits, iters=2):
    """On-device replica of WavefrontSearch._select_modes: static-bits
    provisional pick, then `iters` Jacobi refinements where each block's
    MPM list is approximated from its left/above same-size neighbours'
    picks. Combines in f32 (host combined f32 base + f64 scalar terms),
    so f32-scale near-ties may rank differently — validated RD-neutral
    at clip scale (results/device_select_r5.md)."""
    F = base.shape[0]
    mb = jnp.sum(jnp.where(cands[..., None] == jnp.arange(67), mb67,
                           0.0), -1)
    total = base + sc * mb
    pick = jnp.argmin(total, axis=2)
    mode = jnp.take_along_axis(cands, pick[..., None], 2)[..., 0]
    for _ in range(iters):
        g = mode.reshape(F, nbh, nbw)
        lm = jnp.pad(g, ((0, 0), (0, 0), (1, 0)))[:, :, :nbw]
        am = jnp.pad(g, ((0, 0), (1, 0), (0, 0)))[:, :nbh, :]
        am = jnp.where(top_mask[None, :, None], 0, am)
        C = _mpm_list_dev(lm.reshape(F, -1), am.reshape(F, -1))
        bits = _bits_dev(cands, C, po, idx_bits, rem_bits)
        total = base + sc * bits
        pick = jnp.argmin(total, axis=2)
        mode = jnp.take_along_axis(cands, pick[..., None], 2)[..., 0]
    order = jnp.argsort(total, axis=2)
    ranked = jnp.take_along_axis(cands, order, 2)
    cost = jnp.take_along_axis(total, order, 2)
    return ranked.astype(jnp.int8), cost[..., 0], cost[..., :2]


def _mpm_scalar_tabs(rm, dep):
    """Host-side f64-exact scalar tables consumed by _bits_dev (same
    constants _mpm_bits_table bakes into its (67,67,67) cube)."""
    po = rm.pick('planar_offset', dep, True)
    npo = rm.pick('non_planar_offset', dep, True)
    mio = rm.pick('mpm_idx_offset', dep, True)
    mrm = rm.pick('mpm_remainder_mult', dep, True)
    mro = rm.pick('mpm_remainder_offset', dep, True)
    idx_bits = np.float32([npo + (i + mio) ** rm.mpm_idx_pow
                           for i in range(5)])
    rem = np.arange(66, dtype=np.float64)
    rem_bits = (npo + mrm * (rem + mro) ** rm.mpm_remainder_pow) \
        .astype(np.float32)
    return np.float32(po), idx_bits, rem_bits


@functools.lru_cache(maxsize=None)
def _fused_luma_builder(W, H, log2_ctu, sizes, F, K, trellis=False,
                        sel=False):
    """Module-level fused luma stage-A jit, shared across search instances
    and QPs (geometry is baked in; QP-dependent values are arguments)."""
    consts = {}
    ctu = 1 << log2_ctu
    for s in sizes:
        src, fill = refs.subst_gather(W, H, s, 0, log2_ctu)
        pi, ni, keep = refs.filter121_indices(s)
        top_mask = (np.arange(H // s) * s) % ctu == 0
        consts[s] = (src, fill, pi, ni, keep, top_mask)

    @jax.jit
    def run(planes, ls, bd, lam_dq, lv, lam, mats, seltabs=None):
        planes = planes.astype(jnp.int32)      # uint8 on the wire
        flat = planes.reshape(F, H * W)
        out = {}
        for s in sizes:
            src, fill, pi, ni, keep, top_mask = consts[s]
            u = jnp.where(jnp.asarray(fill)[None, :, None], 128,
                          flat[:, jnp.asarray(src)])          # (F, N, L)
            L = src.shape[1]
            u = u.reshape(-1, L)
            uf = jnp.where(jnp.asarray(keep)[None, :], u,
                           (u[:, jnp.asarray(pi)] + 2 * u
                            + u[:, jnp.asarray(ni)] + 2) >> 2)
            v = jnp.concatenate([u, uf], axis=1)
            pred = intra_pred.predict_all_modes_m(v, mats[s], s)
            blocks = planes.reshape(F, H // s, s, W // s, s) \
                .transpose(0, 1, 3, 2, 4).reshape(-1, s * s)
            cands, cost = _stage_a_select(
                pred, blocks, K, ls[s], bd[s], lam_dq, lv,
                s.bit_length() - 1, lam, trellis)
            N = src.shape[0]
            cands = cands.reshape(F, N, -1)
            cost = cost.reshape(F, N, -1)
            if sel:
                # winner selection + MPM Jacobi refinement + ranking on
                # device: only 18 bytes/block cross the tunnel instead
                # of 30 (the f32 per-candidate costs were 60% of the
                # stage-A download), and host_select work disappears
                sc, mb67, po, idx_bits, rem_bits = seltabs
                out[s] = _select_modes_dev(
                    cost, cands.astype(jnp.int32), H // s, W // s,
                    jnp.asarray(top_mask), sc, mb67, po, idx_bits,
                    rem_bits)
            else:
                out[s] = (cands, cost)
        return out

    return run


@functools.lru_cache(maxsize=None)
def _fused_luma_sharded_builder(W, H, log2_ctu, sizes, F, K, mesh,
                                trellis=False):
    """Row-band-sharded fused luma stage A over a (frame, row) mesh.

    The SAME cost model as the single-device path (substituted+filtered
    refs, 67-mode sweep, SSD + lam*rate) — results are bit-identical by
    construction: the per-band gather tables are slices of the full-frame
    substitution gather, translated into band-local coordinates. Each band
    holds (band_h + 1) rows: a one-row halo from the band above arrives
    via jax.lax.ppermute over 'row' (ICI), exactly the samples intra
    availability permits a band to reference (above row r0-1; below-left
    never crosses a CTU-row boundary). Band 0 keeps its own table where
    the picture edge makes the halo row unavailable (substitution fills).
    dist/sharded.py's halo demo is superseded by this production path."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    nf = mesh.shape.get("frame", 1)
    nr = mesh.shape["row"]
    band_h = H // nr
    assert band_h % (1 << log2_ctu) == 0 and band_h * nr == H, \
        "row sharding requires CTU-row-aligned equal bands"

    consts = {}
    for s in sizes:
        src, fill = refs.subst_gather(W, H, s, 0, log2_ctu)
        nb = (band_h // s) * (W // s)
        loc = []
        for b in range(nr):
            sl = src[b * nb:(b + 1) * nb] - (b * band_h - 1) * W
            loc.append(sl.astype(np.int32))
        # interior bands share one pattern; band 0 differs (picture top)
        for b in range(2, nr):
            assert (loc[b] == loc[1]).all(), "interior bands must match"
        fl = [fill[b * nb:(b + 1) * nb] for b in range(nr)]
        for b in range(2, nr):
            assert (fl[b] == fl[1]).all()
        pi, ni, keep = refs.filter121_indices(s)
        consts[s] = (loc[0], loc[1] if nr > 1 else loc[0],
                     fl[0], fl[1] if nr > 1 else fl[0], pi, ni, keep)

    F_loc = F // nf

    def band_fn(planes, ls_a, bd_a, lam_dq, lv, lam, mats):
        # planes: (F_loc, band_h, W) uint8 on the wire; halo row from the
        # band above
        planes = planes.astype(jnp.int32)
        last = planes[:, -1, :]
        halo = jax.lax.ppermute(last, "row",
                                [(i, i + 1) for i in range(nr - 1)])
        x = jnp.concatenate([halo[:, None, :], planes], axis=1)
        flat = x.reshape(F_loc, (band_h + 1) * W)
        is0 = jax.lax.axis_index("row") == 0
        out = []
        for si, s in enumerate(sizes):
            src0, src1, fill0, fill1, pi, ni, keep = consts[s]
            src = jnp.where(is0, jnp.asarray(src0), jnp.asarray(src1))
            fill = jnp.where(is0, jnp.asarray(fill0), jnp.asarray(fill1))
            u = jnp.where(fill[None, :, None], 128, flat[:, src])
            L = src0.shape[1]
            u = u.reshape(-1, L)
            uf = jnp.where(jnp.asarray(keep)[None, :], u,
                           (u[:, jnp.asarray(pi)] + 2 * u
                            + u[:, jnp.asarray(ni)] + 2) >> 2)
            v = jnp.concatenate([u, uf], axis=1)
            pred = intra_pred.predict_all_modes_m(v, mats[s], s)
            blocks = x[:, 1:, :].reshape(F_loc, band_h // s, s, W // s, s) \
                .transpose(0, 1, 3, 2, 4).reshape(-1, s * s)
            cands, cost = _stage_a_select(
                pred, blocks, K, ls_a[si], bd_a[si], lam_dq, lv,
                s.bit_length() - 1, lam, trellis)
            nb = src0.shape[0]
            out.append(cands.reshape(F_loc, nb, -1))
            out.append(cost.reshape(F_loc, nb, -1))
        return tuple(out)

    sm = shard_map(
        band_fn, mesh=mesh,
        in_specs=(P("frame", "row", None), P(), P(), P(), P(), P(), P()),
        out_specs=tuple(P("frame", "row", None)
                        for _ in range(2 * len(sizes))),
        check_vma=False)
    sm_jit = jax.jit(sm)

    def run(planes, ls, bd, lam_dq, lv, lam, mats):
        ls_a = np.array([ls[s] for s in sizes], dtype=np.int32)
        bd_a = np.array([bd[s] for s in sizes], dtype=np.int32)
        res = sm_jit(planes, ls_a, bd_a, lam_dq, lv, lam, mats)
        out = {}
        for si, s in enumerate(sizes):
            out[s] = (res[2 * si], res[2 * si + 1])
        return out

    return run


@functools.partial(jax.jit, static_argnums=(2, 7, 9))
def _stage_a_select(pred, orig, num_cands, ls, bd_shift, lam_dq, lv,
                    log2, lam, trellis=False):
    """pred (N,67,WH), orig (N,WH) -> (cands (N,K+2), cost (N,K+2)).

    Cost is ssd + lam*rate WITHOUT mode bits — the host applies the exact
    (MPM-dependent) mode-bit term and picks the winner. trellis=True
    ranks with the trellis quantizer (the reference's search discipline,
    quantizer.rs:519 with trellis=true) — pass the trellis lam_dq/lv
    tables with it."""
    sad = jnp.abs(pred - orig[:, None, :]).sum(-1)           # (N,67)
    ang = sad[:, 2:]
    _, top = jax.lax.top_k(-ang, num_cands)                  # (N,K)
    cands = jnp.concatenate(
        [jnp.zeros((sad.shape[0], 1), jnp.int32),
         jnp.ones((sad.shape[0], 1), jnp.int32),
         (top + 2).astype(jnp.int32)], axis=1)               # (N,K+2)
    K = num_cands + 2
    s = 1 << log2
    p = jnp.take_along_axis(pred, cands[:, :, None], axis=1)  # (N,K,WH)
    p = p.reshape(-1, s, s)
    o = jnp.repeat(orig[:, None, :], K, axis=1).reshape(-1, s, s)
    ssd, rate = _rd_eval_inner(p, o, ls, bd_shift, lam_dq, lv, log2,
                               trellis)
    cost = ssd.reshape(-1, K) + lam * (rate.reshape(-1, K) / 16384.0)
    return cands.astype(jnp.int8), cost                # int8 on the wire


@functools.partial(jax.jit, static_argnums=(6,))
def _rd_eval(pred, orig, ls, bd_shift, lam_dq, lv, log2):
    return _rd_eval_inner(pred, orig, ls, bd_shift, lam_dq, lv, log2)


def _rd_eval_inner(pred, orig, ls, bd_shift, lam_dq, lv, log2,
                   trellis=False):
    """pred/orig (B,s,s) -> (ssd (B,) f32, rate (B,) f32). trellis=True
    quantizes with the exact Viterbi (pass trellis-variant tables)."""
    res = orig.astype(jnp.int32) - pred.astype(jnp.int32)
    t = transforms._forward(res)
    if trellis:
        from ..kernels import trellis_pallas
        q, rate = trellis_pallas.trellis_rate_auto(t, ls, bd_shift,
                                                   lam_dq, lv, log2)
    else:
        q, rate = kq.greedy_depquant(t, ls, bd_shift, lam_dq, log2, lv)
    d = kq.dequantize(q, ls, bd_shift)
    r = transforms._inverse(d)
    rec = jnp.clip(pred + r, 0, 255)
    ssd = ((rec - orig.astype(jnp.int32)) ** 2).sum((1, 2))
    return ssd.astype(jnp.float32), rate
