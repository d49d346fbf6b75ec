"""Benchmark: dataset-20-scale SLAM end-to-end on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
   "stages": {per-stage seconds}, "util": {per-stage utilization rows}}
(the stages/util keys are omitted under BENCH_STAGES=0)

Baseline (BASELINE.md, measured on the reference's own NumPy code, 1 CPU
core, dataset-20 shapes: 4,956 steps x 1,081 rays):
  scan matching 4,955 pairs   ~77 s
  OGM build 4,956 scans       ~287 s
  loop-closure ICPs (~494)    ~8 s
  -> ~372 s for the compute the reference spends nearly all its time in.

This benchmark runs the SAME work (batched ICP scan matching + loop
closures + pose-graph LM + log-odds map build) on synthetic data with
dataset-20 shapes, on device, and reports wall-clock with compile excluded.
vs_baseline = baseline_seconds / our_seconds (speedup factor).
"""

import json
import os
import sys
import time


def pathlib_cache():
    d = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    os.makedirs(d, exist_ok=True)
    return d

BASELINE_SECONDS = 372.0
# reference texture stage, measured via tools/texture_reference_bench.py
# (2026-08-19, 64 fabricated 480x640 frames through the reference's actual
# generate_texture_map: 126.6 ms/frame x 2,407 dataset-20 RGB frames)
TEXTURE_BASELINE_S = 304.6
# reference --filter_lidar stage, tools/filter_reference_bench.py
# (4.7 ms/scan x 4,956 scans)
FILTER_BASELINE_S = 23.1
N_STEPS = 4956
N_RAYS = 1081
N_RGB_FRAMES = 2407  # dataset-20 Kinect rgb track length


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _wait_for_tunnel(deadline_s: float = None):
    """Hold off backend init until the TPU tunnel answers a probe.

    The relay behind the tunnel occasionally dies (dead listener — backend
    init then hangs forever) and may come back minutes later. A hung
    in-process init cannot be retried (the first attempt wedges the client),
    so the probe runs in SUBPROCESSES — strictly sequential, never
    concurrent with this process's own init, which would wedge a healthy
    tunnel. Returns True when a probe succeeds; False when the deadline
    passes (the caller then initializes anyway and devices_or_die FATALs
    with the diagnosis). Skipped entirely on non-axon platforms."""
    import subprocess

    if "axon" not in os.environ.get("JAX_PLATFORMS", ""):
        return True
    if deadline_s is None:
        deadline_s = float(os.environ.get("BENCH_TUNNEL_WAIT_S", "900"))
    t0 = time.time()
    attempt = 0
    while True:
        attempt += 1
        try:
            rc = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                capture_output=True, timeout=120).returncode
        except subprocess.TimeoutExpired:
            rc = -1
        if rc == 0:
            if attempt > 1:
                log(f"tunnel probe ok on attempt {attempt} "
                    f"({time.time() - t0:.0f}s)")
            return True
        waited = time.time() - t0
        if waited + 120 > deadline_s:
            log(f"tunnel probe still failing after {waited:.0f}s "
                f"({attempt} attempts) — proceeding to the watchdog")
            return False
        log(f"tunnel probe {attempt} failed (rc={rc}, {waited:.0f}s in); "
            "retrying in 120s")
        time.sleep(120)


def main():
    import jax
    import numpy as np
    import jax.numpy as jnp

    _wait_for_tunnel()

    jax.config.update("jax_compilation_cache_dir",
                      str(pathlib_cache()))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    sys.path.insert(0, ".")
    from lidar_slam_tpu.config import SlamConfig
    from lidar_slam_tpu.models import occupancy, odometry, pose_graph, scan_matching
    from lidar_slam_tpu.models.slam import compute_loop_closures, loop_closure_candidates
    from lidar_slam_tpu.ops import icp as icp_ops
    from lidar_slam_tpu.ops import scan as scan_ops
    from lidar_slam_tpu.utils import io

    from lidar_slam_tpu.utils.profiling import devices_or_die
    dev = devices_or_die()[0]
    log(f"device: {dev} ({dev.platform})")

    log("generating dataset-20-shaped synthetic data (2 seeds)...")
    cfg = SlamConfig()
    cand = loop_closure_candidates(N_STEPS, 10)
    chunk = 64

    def prep(seed):
        data = io.synthetic_dataset(n_steps=N_STEPS, n_rays=N_RAYS, seed=seed)
        counts = jnp.asarray(data["encoder"]["counts"], jnp.float32)
        gyro = jnp.asarray(data["imu"]["angular_velocity"], jnp.float32)
        ranges = jnp.asarray(data["lidar"]["ranges"], jnp.float32)
        points, masks = scan_ops.scans_to_points(ranges, 0.1, 30.0, cfg.lidar)
        return counts, gyro, points, masks, icp_ops.lift_to_3d(points)

    # warm-up and timed runs use DIFFERENT data (same shapes): compiled code
    # is reused, runtime result memoization is impossible. Several timed
    # seeds: the tunneled device occasionally stalls for seconds, so the
    # headline is the BEST of the timed reps (each a full fresh-data run).
    warm = prep(20)
    timed_runs = [prep(21), prep(23), prep(24)]
    # data-adaptive slot count, shared so all runs compile identically —
    # ALWAYS including the stage-timing seeds (22, 25): a stage seed
    # needing more in-bounds cells than the e2e seeds would otherwise be
    # silently tail-truncated, biasing the stage/util rows vs the e2e
    # workload — and K must not depend on BENCH_STAGES, or the headline
    # would compile a different map build under different env settings.
    # The prepped stage tuples are kept and reused by the stage loop.
    stage_runs = {s: prep(s) for s in (22, 25)}
    K = max(occupancy.adaptive_ray_cells(w[2], w[3], cfg.map, 30.0)
            for w in [warm] + timed_runs + list(stage_runs.values()))
    log(f"adaptive ray slots K = {K}")

    def pipeline(inputs):
        counts, gyro, points, masks, pts3 = inputs
        poses_odom = odometry.poses_from_odometry(counts, gyro)
        sm = scan_matching.poses_from_scan_matching(
            poses_odom, points, masks, cfg.icp, chunk_size=chunk)
        max_d, max_y = odometry.max_step_gates(counts, gyro)
        loop_T, accept, _, _ = compute_loop_closures(
            pts3, masks, cand, 10, max_d, max_y, chunk_size=chunk)
        opt = pose_graph.optimize_trajectory(
            sm.poses, sm.relative_poses, jnp.asarray(cand),
            jnp.asarray(cand + 10), loop_T, accept, cfg.pose_graph)
        grid = occupancy.build_logodds(opt.poses, points, masks, cfg.map, K)
        return opt.poses, grid, sm, accept

    filter_s = None
    # warm-up: compiles every kernel at the real shapes
    log("warm-up (compiling)...")
    t0 = time.time()
    poses, grid, sm, accept = pipeline(warm)
    np.asarray(poses[:1]); np.asarray(grid[:2, :2])
    log(f"warm-up done in {time.time() - t0:.1f}s "
        f"(icp iters mean {float(jnp.mean(sm.iters)):.1f}, "
        f"loops accepted {int(jnp.sum(accept))})")

    # compiled-Pallas regression gate: the NN kernel must agree with the
    # jnp reference path index-for-index on one real chunk (a Mosaic
    # regression would otherwise silently corrupt correspondences)
    if jax.default_backend() == "tpu":
        from lidar_slam_tpu.ops.nn import nearest_neighbors
        from lidar_slam_tpu.ops.pallas_nn import nearest_neighbors_pallas
        pts3, masks = warm[4], warm[3]
        s, t = pts3[1:65], pts3[:64]
        tm = masks[:64]
        idx_p, matched = nearest_neighbors_pallas(s, t, tm,
                                                  return_matched=True)
        idx_j = nearest_neighbors(s, t, tm)
        # the two paths round the distance contraction differently (MXU
        # 6-pass vs XLA's einsum lowering), so floating NEAR-TIES may pick
        # different-but-equidistant neighbors (~0.05% of indices on real
        # data). A Mosaic regression instead produces LARGE distance gaps:
        # gate on the true squared distances of the chosen neighbors.
        mj = jnp.take_along_axis(t, idx_j[..., None], axis=-2)
        d2p = jnp.sum((s - matched) ** 2, -1)
        d2j = jnp.sum((s - mj) ** 2, -1)
        gap = jnp.abs(d2p - d2j)
        disagree = idx_p != idx_j
        frac = float(jnp.mean(disagree))
        max_gap = float(gap.max())
        if frac > 0.01 or max_gap > 1e-3:
            raise AssertionError(
                f"Pallas NN kernel regressed: {frac:.4f} of indices "
                f"disagree with the jnp path, max d2 gap {max_gap:.2e}")
        if not bool(jnp.all(jnp.where(disagree, True,
                                      (matched == mj).all(-1)))):
            raise AssertionError("Pallas NN matched-points output disagrees")
        log(f"pallas NN kernel vs jnp path: {frac*100:.3f}% near-tie index "
            f"flips, max d2 gap {max_gap:.2e} — OK")

        # compiled-Pallas regression gate #2: the ray-walk map kernel must
        # reproduce the scatter path bit-for-bit on a real slice (the maps
        # are the pipeline's output artifact; a Mosaic regression here
        # would silently corrupt them)
        from lidar_slam_tpu.ops.raywalk import build_logodds_raywalk
        _, _, wpts, wmasks, _ = warm
        rng32 = np.random.default_rng(7)
        poses32 = jnp.asarray(
            rng32.normal(0, 2.0, (32, 3)).cumsum(0) * 0.01, jnp.float32)
        g_walk = np.asarray(build_logodds_raywalk(
            poses32, wpts[:32], wmasks[:32], cfg.map, K))
        g_scat = np.asarray(occupancy.build_logodds(
            poses32, wpts[:32], wmasks[:32], cfg.map, K,
            backend="scatter"))
        walk_diff = float(np.abs(g_walk - g_scat).max())
        # ray-order vs scatter-order accumulation may differ by ULPs in
        # principle (measured 0.0 at dataset scale); a real regression
        # shows up at the log4 scale (~1.386)
        if walk_diff > 1e-4:
            raise AssertionError(
                f"raywalk kernel regressed: max |logodds diff| vs the "
                f"scatter path = {walk_diff:g}")
        log(f"raywalk kernel vs scatter path: max |diff| {walk_diff:g} "
            "on 32 scans — OK")

        # optional-path timing: DBSCAN + statistical filters at full scale
        # (the reference baseline excludes them too; PERF.md has the row).
        # Same timing discipline as every other stage: np.asarray-fetched
        # warm-up (block_until_ready can return early on axon), a
        # fresh-value throwaway to drain the first-timed-leg warm-in, and
        # best-of-2 on distinct inputs (the runtime memoizes value-repeat
        # calls). The round-4 single-shot leg recorded 0.54 s where
        # alternating drained legs measure 0.23-0.27 s — the difference
        # was the warm-in artifact, not filter compute.
        from lidar_slam_tpu.ops import filters

        def filter_pass(pts, mks):
            fm = filters.dbscan_filter_scans(pts, mks)
            fm = filters.statistical_filter_scans(pts, fm)
            return fm

        np.asarray(filter_pass(warm[2], masks)[:1])  # compile + warm
        np.asarray(filter_pass(warm[2] + 1e-3, masks)[:1])  # throwaway
        filter_s = None
        for fr in range(2):
            pts_f, mks_f = timed_runs[fr][2], timed_runs[fr][3]
            np.asarray(pts_f[:1]); np.asarray(mks_f[:1])  # drain uploads
            t0 = time.time()
            fm = filter_pass(pts_f, mks_f)
            np.asarray(fm[:1])  # fetch forces execution
            leg = time.time() - t0
            filter_s = leg if filter_s is None else min(filter_s, leg)
        log(f"filter path (DBSCAN+statistical, {N_STEPS}x{N_RAYS}): "
            f"{filter_s:.2f}s "
            f"(kept {float(jnp.mean(fm)):.3f} of rays)")

    log("timed runs (fresh data each)...")
    reps = []
    for timed in timed_runs:
        t0 = time.time()
        poses, grid, sm, accept = pipeline(timed)
        # np.asarray fetch, not block_until_ready alone: the latter can
        # return before real execution on the tunneled device (CLAUDE.md)
        np.asarray(poses[:1]); np.asarray(grid[:2, :2])
        reps.append(time.time() - t0)
    elapsed = min(reps)
    log(f"timed reps: {[f'{r:.2f}' for r in reps]} -> best {elapsed:.2f}s")

    stages = {}
    util = {}
    if os.environ.get("BENCH_STAGES") != "0":
        # per-stage wall clock on further fresh seeds (the runtime memoizes
        # value-identical computations, so stage timing needs fresh values);
        # the sync after every stage makes the sum slightly exceed e2e.
        # TWO passes, keep the second: the first drained-queue execution of
        # each stage in a process pays ~0.5-1 s of one-time executable-load
        # overhead on the tunneled device even when the compile cache is
        # hot (measured), which would otherwise inflate the stage rows.
        for stage_seed in (22, 25):
            counts, gyro, points, masks, pts3 = stage_runs[stage_seed]
            # drain the prep transfer/compute queue so the first stage
            # timer doesn't absorb it (the tunnel transfer of the 43 MB
            # point set otherwise lands in the odometry row)
            jax.block_until_ready((counts, gyro, points, masks, pts3))
            # real fetches from EVERY independent transfer: fetching counts
            # alone does not force the (much larger) point arrays, whose
            # stalled transfer would then land in the odometry row
            np.asarray(counts[:1]); np.asarray(points[:1, :1])
            np.asarray(masks[:1, :1]); np.asarray(pts3[:1, :1])
            t = time.time()
            poses_odom = odometry.poses_from_odometry(counts, gyro)
            np.asarray(poses_odom[:1])  # real fetch closes each timer
            stages["odometry_s"] = round(time.time() - t, 3)
            t = time.time()
            sm3 = scan_matching.poses_from_scan_matching(
                poses_odom, points, masks, cfg.icp, chunk_size=chunk)
            np.asarray(sm3.poses[:1])
            stages["scan_matching_s"] = round(time.time() - t, 3)
            t = time.time()
            max_d, max_y = odometry.max_step_gates(counts, gyro)
            loop_T, accept3, loop_err, loop_it = compute_loop_closures(
                pts3, masks, cand, 10, max_d, max_y, chunk_size=chunk)
            np.asarray(loop_T[:1])
            stages["loop_closures_s"] = round(time.time() - t, 3)
            t = time.time()
            opt = pose_graph.optimize_trajectory(
                sm3.poses, sm3.relative_poses, jnp.asarray(cand),
                jnp.asarray(cand + 10), loop_T, accept3, cfg.pose_graph)
            np.asarray(opt.poses[:1])
            stages["pose_graph_s"] = round(time.time() - t, 3)
            t = time.time()
            grid3 = occupancy.build_logodds(opt.poses, points, masks,
                                            cfg.map, K)
            np.asarray(grid3[:2, :2])
            stages["map_build_s"] = round(time.time() - t, 3)
        log(f"scan-matching iters: mean {float(jnp.mean(sm3.iters)):.1f} "
            f"p50 {float(jnp.percentile(sm3.iters, 50)):.0f} "
            f"p90 {float(jnp.percentile(sm3.iters, 90)):.0f} "
            f"max {int(jnp.max(sm3.iters))}")
        for k, v in stages.items():
            log(f"stage {k}: {v:.3f}s")

        # ---- utilization vs the measured device floors (PERF.md) ----
        # map walk: tile visits actually executed by the ray-walk kernel
        # (each = one masked (TS, 128) vector RMW); ~21 ns/visit on the
        # v5e once desc precompute + per-ray setup are netted out (v11
        # fused kernel; derived stage floor 0.70 s — PERF.md round 4)
        from lidar_slam_tpu.ops.raywalk import _resolve_version, visit_descriptors
        # the visit model only describes the v2+ packed-descriptor kernels;
        # if capacity limits ever force the v1 fallback (K too large for
        # the crossing buffers), visit counts from visit_descriptors would
        # silently UNDERCOUNT — skip the rows rather than emit wrong ones
        if _resolve_version(cfg.map, K, 8) != 1:
            sample = min(64, N_STEPS)
            desc = jax.vmap(
                lambda p, pt, m: visit_descriptors(p, pt, m, cfg.map, K)[-1]
            )(opt.poses[:sample], points[:sample], masks[:sample])
            visits_per_scan = float(((desc & 1023) < K).sum()) / sample
            total_visits = visits_per_scan * N_STEPS
            util["map_visits_per_scan"] = round(visits_per_scan, 1)
            util["map_ns_per_visit"] = round(
                stages["map_build_s"] * 1e9 / total_visits, 1)
            util["map_visits_per_s"] = round(total_visits
                                             / stages["map_build_s"])

        # scan matching: executed chunk-iterations under the phased-resort
        # schedule = sum over depths t of ceil(live_t / chunk); per-pass
        # cost vs the ~1.08 ms VPU-elementwise floor of one 64x1081x1081
        # NN+Kabsch pass (PERF.md round-2 measurement)
        iters = np.asarray(sm3.iters)
        executed = int(sum(int(np.ceil((iters > t).sum() / chunk))
                           for t in range(int(iters.max()))))
        util["sm_chunk_iters_executed"] = executed
        util["sm_ms_per_chunk_iter"] = round(
            stages["scan_matching_s"] * 1e3 / max(executed, 1), 3)

        # pose graph: whole-solve wall clock and LM iterations
        util["lm_solve_ms"] = round(stages["pose_graph_s"] * 1e3, 1)
        util["lm_iterations"] = int(opt.iterations)

    # ---- texture stage: the reference's hot loop #4, measured at the
    # FULL dataset-20 frame count (2,407 x 480x640) through the production
    # packed-upload path (models/texture.py). Frames are synthesized per
    # batch in the prefetch thread (values vary per batch, so the runtime
    # cannot memoize; bytes/shapes identical to the real sensor stream).
    # Decode is excluded here and measured separately by
    # tools/texture_bench.py (~6 ms/frame, overlapped in the same prefetch
    # thread in production) — the stage is upload-bound on the tunneled
    # device (tools/upload_bench.py: 1.54 MB/frame at ~45 MB/s = 33.9
    # ms/frame hard link floor).
    texture_s = None
    if os.environ.get("BENCH_TEXTURE") != "0":
        from lidar_slam_tpu.models import texture as texture_mod

        H, W = 480, 640
        base_rng = np.random.default_rng(30)
        base_disp = base_rng.integers(300, 800, (16, H, W)).astype(np.uint16)
        base_rgb = base_rng.integers(0, 255, (16, H, W, 3)).astype(np.uint8)

        disp_buf = np.empty_like(base_disp)
        # loader_salt: bump per timed leg/attempt so REPEATED legs see
        # fresh frame VALUES — the runtime memoizes value-identical
        # uploads/computations, and a retry replaying identical bytes
        # would measure a memoized no-op instead of the link (the same
        # trap the probe comment below documents)
        loader_salt = {"v": 0}

        def tex_loader(ids):
            b = len(ids)
            # cheap per-batch value variation (defeats memoization; the
            # +offset stays within the valid disparity range). The add
            # writes into a preallocated buffer — a fresh 9.8 MB
            # allocation per 16-frame batch measured ~0.1 ms/frame of
            # page-fault cost on the 1-core host, and every consumer
            # (native projection, batch packing, dtype conversion) copies
            # or fully consumes the frames inside the same prep call, so
            # reuse is safe.
            off = np.uint16((int(ids[0]) + loader_salt["v"]) % 97)
            np.add(base_disp[:b], off, out=disp_buf[:b])
            return disp_buf[:b], base_rgb[:b]

        tex_grid = np.zeros((cfg.map.width, cfg.map.height), np.uint8)
        tex_poses = np.asarray(base_rng.normal(0, 5.0, (N_RGB_FRAMES, 3)),
                               np.float32)
        frame_ids = np.arange(N_RGB_FRAMES)

        # host->device link probe: the texture stage is upload-bound, and
        # the tunnel's rate varies by the day, so the JSON carries the
        # link rate measured NOW and the derived per-frame byte floor —
        # the texture row is then interpretable whatever the tunnel
        # weather was during the run. Two probe rules, both measured
        # (2026-08-19 A/B): (a) SUSTAINED throughput — back-to-back
        # uploads at the stage's own ~24 MB batch size, aggregate time —
        # not single-transfer burst; (b) INCOMPRESSIBLE random bytes —
        # the tunnel compresses in flight, so constant np.full buffers
        # measure 86-89 MB/s while random payload moves at 35-45 MB/s,
        # and a constant-data floor mislabels an honest leg as a 3x
        # stall. Best-of-two rounds keeps one mid-probe stall from
        # deflating the floor.
        # Probe validity (round-4 lesson): BENCH_r04 recorded rounds
        # [30.0, 3.8] MB/s — a mid-probe stall — and then reported the
        # device leg at 0.87x the "floor", i.e. faster than the claimed
        # hard minimum, which proves the floor was wrong, not the engine
        # fast. Now: >= 3 rounds, stall rejection (drop rounds > 2x below
        # the best), the floor is the max sustained rate, and a leg ratio
        # below 0.95 is flagged probe-invalid downstream instead of being
        # quoted as a ratio.
        probe_mb = 24
        probe_rng = np.random.default_rng(7)
        probe_bufs = [probe_rng.integers(0, 256, probe_mb << 20)
                      .astype(np.uint8) for _ in range(3)]
        round_rates = []
        for rnd in range(3):
            # fresh values each round (the runtime memoizes identical
            # uploads; a reversed/rolled view re-copies on the host)
            t0 = time.time()
            for buf in probe_bufs:
                np.asarray(jax.device_put(
                    buf if rnd == 0 else
                    (buf[::-1] if rnd == 1 else np.roll(buf, 1)))[:1])
            round_rates.append(3 * probe_mb / (time.time() - t0))
        link_mbps = max(round_rates)
        stalled = [r for r in round_rates if r < link_mbps / 2]
        link_probe_ok = len(round_rates) - len(stalled) >= 2
        bytes_per_frame = 480 * 640 * (2 + 3) / 2**20  # uint16 disp + rgb
        floor_ms = bytes_per_frame / link_mbps * 1e3
        util["link_MBps"] = round(link_mbps, 1)
        util["link_probe_rounds_MBps"] = [round(r, 1) for r in round_rates]
        util["link_probe_ok"] = link_probe_ok
        util["texture_link_floor_ms_per_frame"] = round(floor_ms, 1)
        log(f"link probe: sustained {link_mbps:.1f} MB/s "
            f"(rounds {[round(r, 1) for r in round_rates]}, "
            f"{len(stalled)} stalled, ok={link_probe_ok}) "
            f"-> texture byte floor {floor_ms:.1f} ms/frame")

        log("texture warm-up (compiling)...")
        texture_mod.generate_texture_map(
            tex_poses[:23], np.arange(23), np.arange(23), tex_grid,
            tex_loader, cfg.map, cfg.camera, batch_size=16)
        # device (raw-bytes) engine: a 768-frame sustained leg — long
        # enough to amortize the stream start (PERF.md round 4 measured
        # 33.2-33.8 ms/frame sustained over the full 2,407; the full leg
        # is not re-paid every round now that the production engine is
        # the native projector below). Up to two attempts: >1.3x the
        # measured byte floor means a tunnel stall, not the code.
        n_dev = 768
        log(f"texture device engine ({n_dev} frames, batch 16, packed "
            "upload)...")
        dev_ms = None
        for attempt in range(2):
            # fresh VALUES per attempt (frames via the loader salt, poses
            # perturbed): a value-identical retry would replay memoized
            # uploads and record an impossibly fast leg
            loader_salt["v"] = attempt + 1
            t0 = time.time()
            texture_mod.generate_texture_map(
                tex_poses[:n_dev] + np.float32(attempt) * 1e-3,
                frame_ids[:n_dev], frame_ids[:n_dev],
                tex_grid, tex_loader, cfg.map, cfg.camera, batch_size=16)
            leg = (time.time() - t0) / n_dev * 1e3
            dev_ms = leg if dev_ms is None else min(dev_ms, leg)
            if leg <= 1.3 * floor_ms:
                break
            if attempt == 0:
                log(f"texture device leg at {leg:.1f} ms/frame is "
                    f"{leg / floor_ms:.2f}x the measured link floor — "
                    "retrying once (stall suspected)")
        texture_s = dev_ms * N_RGB_FRAMES / 1e3  # full-scale equivalent
        util["texture_device_ms_per_frame"] = round(dev_ms, 1)
        ratio = dev_ms / floor_ms
        # a leg "faster than the byte floor" (< 0.95x) is impossible —
        # it means the probe understated the link, so the ratio is
        # meaningless; mark it invalid instead of quoting it
        if ratio >= 0.95 and link_probe_ok:
            util["texture_vs_link_floor"] = round(ratio, 2)
            log(f"texture device engine: {dev_ms:.1f} ms/frame = "
                f"{ratio:.2f}x the measured link floor "
                f"({texture_s:.1f}s at dataset scale; "
                f"reference {TEXTURE_BASELINE_S:.0f}s = "
                f"{TEXTURE_BASELINE_S / texture_s:.1f}x)")
        else:
            util["texture_vs_link_floor"] = "probe-invalid"
            log(f"texture device engine: {dev_ms:.1f} ms/frame "
                f"({texture_s:.1f}s at dataset scale) — link probe "
                f"INVALID (ratio {ratio:.2f} vs floor from a "
                f"{'stall-hit' if not link_probe_ok else 'understated'} "
                "probe; no floor ratio quoted)")

        # production engine (main.py projector="auto"): the C++ host
        # projector reduces each frame to its last-writer-wins paint ops
        # and uploads ONLY those (~3 KB/frame vs 1.54 MB/frame) — the
        # stage leaves the link wall entirely and becomes host-compute
        # bound (native/slamio.cpp slamio_project_frames). The device-path
        # leg above is kept as the oracle-engine row (and the engine an
        # attached-PCIe host would pick).
        from lidar_slam_tpu.utils import native as native_mod
        if native_mod.available():
            log(f"texture stage ({N_RGB_FRAMES} frames, native paint-op "
                "projector)...")
            # best-of-3 fresh-value reps, same discipline as the e2e
            # headline: the stage uploads only ~3 KB/frame, so a slow leg
            # is a tunnel stall burst, not the engine (a 512-frame probe
            # on a stall-heavy day measured 2.4-2.9 ms/frame while a
            # single 2,407-frame bench pass landed at 7.1; late round 5
            # measured back-to-back full legs spread 1.67-2.07 ms/frame
            # with the same code, so two reps can both land on bursts)
            rep_ms = []
            for rep in range(3):
                loader_salt["v"] = 10 + rep  # fresh frame values per rep
                p = tex_poses + np.float32(rep) * 1e-3
                t0 = time.time()
                texture_mod.generate_texture_map(
                    p, frame_ids, frame_ids, tex_grid, tex_loader,
                    cfg.map, cfg.camera, batch_size=16, projector="native")
                rep_ms.append((time.time() - t0) * 1e3 / N_RGB_FRAMES)
            tex_native_s = min(rep_ms) * N_RGB_FRAMES / 1e3
            util["texture_native_reps_ms_per_frame"] = [
                round(r, 2) for r in rep_ms]
            if tex_native_s < texture_s:
                texture_s = tex_native_s
            stages["texture_s"] = round(tex_native_s, 3)
            util["texture_ms_per_frame"] = round(
                tex_native_s * 1e3 / N_RGB_FRAMES, 2)
            log(f"texture stage (paint-op engine): {tex_native_s:.1f}s "
                f"({util['texture_ms_per_frame']:.2f} ms/frame; reference "
                f"{TEXTURE_BASELINE_S:.0f}s = "
                f"{TEXTURE_BASELINE_S / tex_native_s:.1f}x)")
        else:
            # without the native library this is the 768-frame device leg
            # scaled to 2,407 frames, NOT a measured full-dataset run —
            # flagged so JSON consumers can tell (advisor r4)
            stages["texture_s"] = round(texture_s, 3)
            stages["texture_s_extrapolated"] = True

    pairs_per_s = (N_STEPS - 1) / elapsed  # headline convenience numbers
    log(f"e2e {elapsed:.2f}s | {pairs_per_s:.0f} scan-pairs/s equivalent | "
        f"speedup vs reference CPU {BASELINE_SECONDS / elapsed:.1f}x")
    if util:
        log(f"utilization: {util}")

    out = {
        "metric": "dataset20_slam_e2e_seconds",
        "value": round(elapsed, 3),
        "unit": "s",
        "vs_baseline": round(BASELINE_SECONDS / elapsed, 2),
    }
    if stages:
        out["stages"] = stages
        out["util"] = util
    # SUPERSET: the reference's full `--mode gtsam --filter_lidar
    # --generate_texture_map` run (SURVEY.md section 3.1) — core pipeline +
    # scan filters + texture, each side measured at dataset-20 scale
    # (reference rows: BASELINE.md; tools/*_reference_bench.py)
    if texture_s is not None and filter_s is not None:
        sup = elapsed + filter_s + texture_s
        sup_base = BASELINE_SECONDS + FILTER_BASELINE_S + TEXTURE_BASELINE_S
        out["superset"] = {
            "metric": "dataset20_full_gtsam_filter_texture_seconds",
            "value": round(sup, 3),
            "baseline_s": round(sup_base, 1),
            "vs_baseline": round(sup_base / sup, 2),
            "composition_s": {"core": round(elapsed, 3),
                              "filter": round(filter_s, 3),
                              "texture": round(texture_s, 3)},
        }
        log(f"superset (core+filter+texture): {sup:.1f}s vs reference "
            f"{sup_base:.0f}s = {sup_base / sup:.1f}x "
            "(texture via the native paint-op projector when built — "
            "host-compute-bound; the raw-bytes device engine rides the "
            f"link at {util.get('link_MBps', '~45')} MB/s measured)")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
