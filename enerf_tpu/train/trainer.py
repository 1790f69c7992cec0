"""Training/eval/test orchestration — the reference Trainer, TPU-native.

Parity: reference nerf/utils.py:289-1416 —
  - workspace management + config snapshot + append-file logging (:393-443)
  - train loop with occupancy update every 16 steps (:944-947), EMA, LR
    schedule stepped per iteration
  - evaluation: full-image staged renders; PSNR/LPIPS/SSIM per image; for
    event-only training the affine (a, b) log-intensity correction solved
    over ALL val images before corrected metrics (:44-71, 1170-1265)
  - rotating checkpoints + best-by-metric with EMA weights (:1295-1416)
  - test renders + mesh export (:768-804, 712-732)

TPU design: the trainer is orchestration only — every compute step is a
jitted pure function over explicit state (TrainState + OccupancyState).
Multi-chip data parallelism is a constructor flag: the same step functions
are jitted with a mesh and batch shardings from parallel/mesh.py.
LPIPS is reported as None when the pretrained-weights package is absent
(documented divergence; see train/metrics.py).
"""

import json
import os
import time
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from enerf_tpu.models.field import FieldStatic, init_field_params, field_density
from enerf_tpu.render.renderer import render_rays_staged
from enerf_tpu.render.march import render_rays_march, render_rays_infer
from enerf_tpu.render.occupancy import (
    init_occupancy, update_occupancy, mark_untrained_grid,
)
from enerf_tpu.train.state import init_train_state
from enerf_tpu.train.step import StepStatics, train_step_frames, train_step_events
from enerf_tpu.train.checkpoints import CheckpointManager, load_checkpoint
from enerf_tpu.train import metrics as M
from enerf_tpu.train.losses import rgb_to_luma
from enerf_tpu.data.rays import get_rays_full


class Trainer:
    def __init__(self, cfg, workspace=None, use_checkpoint=None, mesh=None,
                 snapshot=True):
        # snapshot=False: read-only uses of a trained workspace (offline
        # render) must not overwrite its args.json / code_version.txt
        # train-time provenance
        self.cfg = cfg
        self.mesh = mesh
        if int(getattr(cfg, "debug_nan", 0)) >= 2:
            # trap the op that produces the first NaN/Inf (slow: disables
            # some fusions and re-runs ops de-optimized on a hit)
            jax.config.update("jax_debug_nans", True)
        # multi-host: only process 0 writes files (logs, ckpts, tensorboard,
        # validation images) — reference utils.py:472-479, 1084-1085
        self.primary = jax.process_index() == 0
        # reference main_nerf.py:46-52: --ff/--tcnn force fp16; on TPU they
        # select the block-packed encoder + bf16 compute.  The three
        # backbones stay distinct (reference network.py / network_ff.py /
        # network_tcnn.py serve as mutual oracles): vanilla = hashgrid +
        # unfused MLPs, --ff = blockgrid + Pallas fused head, --tcnn =
        # blockgrid + unfused MLPs.
        use_fast = bool(cfg.ff or cfg.tcnn)
        compute_dtype = jnp.bfloat16 if (cfg.fp16 or use_fast) else jnp.float32
        self.static = FieldStatic(
            bound=cfg.bound,
            out_dim_color=cfg.out_dim_color,
            disable_view_direction=bool(cfg.disable_view_direction),
            bg_radius=cfg.bg_radius,
            encoding=(("blockgrid" if use_fast else "hashgrid")
                      if cfg.encoding == "auto" else cfg.encoding),
            use_fused_head=bool(cfg.ff) and bool(cfg.cuda_ray),
            compute_dtype=compute_dtype,
            grid_block=cfg.grid_block,
            num_levels=cfg.num_levels,
            level_dim=cfg.level_dim,
            bf16_gather=(None if cfg.bf16_gather < 0
                         else bool(cfg.bf16_gather)),
            segsum_table_grad=bool(cfg.segsum_grad),
            mxu_encode=bool(getattr(cfg, "mxu_grad", 0)),
            mxu_rows=int(getattr(cfg, "mxu_rows", 2048)),
            coalesce_rounds=int(getattr(cfg, "coalesce_rounds", 3)),
            position_grads=bool(cfg.position_grads),
            density_bias=cfg.density_bias,
            hidden_dim=cfg.hidden_dim,
            hidden_dim_color=cfg.hidden_dim_color,
            geo_feat_dim=cfg.geo_feat_dim,
        )
        self.ss = StepStatics(
            field_static=self.static,
            num_steps=cfg.num_steps,
            upsample_steps=cfg.upsample_steps,
            min_near=cfg.min_near,
            density_scale=cfg.density_scale,
            C_thres=cfg.C_thres,
            event_only=bool(cfg.event_only),
            use_luma=bool(cfg.use_luma),
            linlog=bool(cfg.linlog),
            weight_loss_rgb=cfg.weight_loss_rgb,
            negative_event_sampling=bool(cfg.negative_event_sampling),
            w_no_ev=cfg.w_no_ev,
            out_dim_color=cfg.out_dim_color,
            use_march=bool(cfg.cuda_ray),
            dt_gamma=cfg.dt_gamma,
            march_samples=cfg.march_samples,
            max_steps=cfg.max_steps,
            compact_frac=cfg.compact_frac,
            share_march=bool(cfg.share_march),
            w_opacity=cfg.w_opacity,
            w_distortion=cfg.w_distortion,
            remat_fixed=int(getattr(cfg, "remat_fixed", 0)),
            warmup_num_steps=int(getattr(cfg, "warmup_num_steps", 0)),
        )
        # rand-pose CLIP guidance (reference main_nerf.py:183 + clip_utils,
        # wired for real here — see train/clip_guidance.py)
        self.clip_guidance = None
        if cfg.rand_pose >= 0 and cfg.clip_text:
            from enerf_tpu.train.clip_guidance import CLIPGuidance
            self.clip_guidance = CLIPGuidance(cfg.clip_text)
            self.ss = self.ss._replace(
                clip_embedder=self.clip_guidance.embedder)

        params = init_field_params(jax.random.PRNGKey(cfg.seed), self.static)
        self.state, self.opt = init_train_state(params, cfg.lr, cfg.iters)
        self.occupancy = init_occupancy(cfg.bound) if cfg.cuda_ray else None

        # workspace (reference utils.py:393-443)
        self.workspace = workspace or os.path.join(
            cfg.outdir, cfg.expweek, cfg.expname
        )
        os.makedirs(self.workspace, exist_ok=True)
        self.log_path = os.path.join(self.workspace, "log.txt")
        if self.primary and snapshot:
            with open(os.path.join(self.workspace, "args.json"), "w") as f:
                json.dump(dataclasses.asdict(cfg), f, indent=2, default=str)
            # code provenance (role of the reference's full source-tree
            # copy into the workspace, utils.py:416-443): git rev + the
            # uncommitted diff reproduce the exact code state
            try:
                import subprocess
                root = os.path.dirname(os.path.dirname(
                    os.path.dirname(os.path.abspath(__file__))))
                rev = subprocess.run(
                    ["git", "-C", root, "rev-parse", "HEAD"],
                    capture_output=True, text=True, timeout=10).stdout.strip()
                diff = subprocess.run(
                    ["git", "-C", root, "diff", "HEAD"],
                    capture_output=True, text=True, timeout=10).stdout
                with open(os.path.join(self.workspace,
                                       "code_version.txt"), "w") as f:
                    f.write(f"git {rev}\n")
                    if diff:
                        f.write("\n# uncommitted diff:\n" + diff)
            except Exception:
                pass

        if self.static.encoding == "hashgrid":
            # ported reference configs land here by default; make the known
            # perf cliff loud (BENCH_NOTES.md: the per-cell layout is ~4.4x
            # slower than the block-packed grid on TPU — 8 address-bound
            # gathers per sample per level vs 1)
            self.log(
                "[warn] encoding=hashgrid is the exact-parity per-cell "
                "oracle (~4.4x slower on TPU than the block-packed grid); "
                "for production training use --encoding blockgrid, or --ff "
                "/ --tcnn which select it automatically (BENCH_NOTES.md)")

        self.ckpt = CheckpointManager(
            os.path.join(self.workspace, "checkpoints"),
            name=cfg.expname, max_keep=cfg.max_keep_ckpt,
            async_save=bool(getattr(cfg, "async_ckpt", 0)),
        )
        self.epoch = 0
        self.best_metric = -np.inf
        self.stats = {"loss": [], "psnr": []}

        # tensorboard scalars (reference tensorboardX usage, utils.py:975-989)
        self.writer = None
        try:
            if not self.primary:
                raise RuntimeError("non-primary process: no tensorboard")
            from torch.utils.tensorboard import SummaryWriter
            self.writer = SummaryWriter(os.path.join(self.workspace, "tb"))
        except Exception:
            pass

        if use_checkpoint and use_checkpoint != "scratch":
            path = self.ckpt.resolve(use_checkpoint)
            if path:
                self.state, self.occupancy, meta = load_checkpoint(
                    path, self.state, self.occupancy
                )
                self.epoch = meta.get("epoch", 0)
                # restore running stats + best metric so the first
                # post-resume eval can't clobber a better best-checkpoint
                # (reference utils.py:1383-1398 restores checkpoint stats)
                st = meta.get("stats") or {}
                for k in ("loss", "psnr"):
                    if isinstance(st.get(k), list):
                        self.stats[k] = list(st[k])
                self.best_metric = float(st.get("best_metric", -np.inf))
                self.log(f"[ckpt] resumed from {path} at epoch {self.epoch}")

        self._sharded_steps = {}  # warm -> jitted sharded step
        self._sharded_render = None
        # pod-slice runs: host-local values must become global jax.Arrays
        # before they reach a program jitted over a multi-process mesh
        # (parallel/multihost.py); single-process meshes take the plain
        # device_put path
        self._mh = mesh is not None and jax.process_count() > 1
        if mesh is not None:
            if self._mh:
                from enerf_tpu.parallel import multihost as MH
                self.state = MH.replicate_from_host(
                    jax.tree.map(np.asarray, self.state), mesh)
                if self.occupancy is not None:
                    self.occupancy = MH.replicate_from_host(
                        jax.tree.map(np.asarray, self.occupancy), mesh)

    # ------------------------------------------------------------------ util

    def log(self, *msg):
        if not self.primary:
            return  # rank-0-only logging (reference utils.py:472-479)
        line = " ".join(str(m) for m in msg)
        print(line, flush=True)
        with open(self.log_path, "a") as f:
            f.write(line + "\n")

    def _get_sharded_step(self, warm=False):
        """Per-warm-phase sharded step (march_warmup must also apply on the
        mesh per-step path, not only the fused-chunk path)."""
        if warm not in self._sharded_steps:
            from enerf_tpu.parallel.mesh import make_sharded_train_step
            from enerf_tpu.train.step import warm_statics
            ss = warm_statics(self.ss) if warm else self.ss
            self._sharded_steps[warm] = make_sharded_train_step(
                ss, self.opt, self.mesh,
                mode="events" if self.cfg.events else "frames")
        return self._sharded_steps[warm]

    def _step_fn(self, batch, rng, warm=False):
        occ = self.occupancy.occ_bitfield if self.occupancy is not None else None
        from enerf_tpu.train.step import warm_statics
        ss = warm_statics(self.ss) if warm else self.ss
        if "rand_pose_side" in batch:
            from enerf_tpu.train.step import train_step_clip
            assert self.clip_guidance is not None, (
                "rand_pose batches need --clip_text (CLIP guidance)"
            )
            side = batch.pop("rand_pose_side")
            self.state, aux = train_step_clip(
                self.state, batch, rng, ss, self.opt,
                self.clip_guidance.text_feat, side, occ,
            )
            return aux
        if self.mesh is not None:
            if self._mh:
                # each host contributes its own slice of the global batch
                # (the sampling key was process-folded in train())
                from enerf_tpu.parallel import multihost as MH
                batch = MH.host_local_batch_to_global(
                    jax.tree.map(np.asarray, batch), self.mesh)
            else:
                from enerf_tpu.parallel.mesh import shard_batch
                batch = shard_batch(batch, self.mesh)
            step = self._get_sharded_step(warm)
            self.state, aux = step(self.state, batch, rng, occ)
            return aux
        if self.cfg.events:
            self.state, aux = train_step_events(
                self.state, batch, rng, ss, self.opt, occ
            )
        else:
            self.state, aux = train_step_frames(
                self.state, batch, rng, ss, self.opt, occ
            )
        return aux

    # ----------------------------------------------------------------- train

    def train(self, provider, valid_provider=None, max_epoch=1):
        cfg = self.cfg
        key = jax.random.PRNGKey(cfg.seed + 1)

        # per-run dataset diagnostics (reference plot_utils auto dumps)
        if self.primary:
            from enerf_tpu.utils.plotting import dump_run_diagnostics
            for p in dump_run_diagnostics(self.workspace, provider):
                self.log(f"[diag] {p}")

        if self.occupancy is not None and hasattr(provider, "train_poses"):
            self.occupancy = mark_untrained_grid(
                self.occupancy, provider.train_poses, provider.intrinsics, cfg.bound
            )
            self.log("[occupancy] marked untrained cells")

        global_step = int(self.state.step)
        steps_per_epoch = getattr(provider, "steps_per_epoch", 100)
        t_start = time.time()
        start_step = global_step  # it/s counts THIS session's steps only

        # fused multi-step path (train/chunk.py): K sampler+step iterations
        # plus the occupancy update in ONE dispatched program; with a mesh it
        # runs data-parallel under shard_map (each chip samples its own
        # batch, grads pmean over ICI).  Falls back to the per-step loop for
        # clip/rand-pose training.
        chunk_len = int(getattr(cfg, "fuse_steps", 1))
        use_chunk = (
            chunk_len > 1
            and self.clip_guidance is None
            and getattr(provider, "rand_pose", -1) < 0
            and hasattr(provider, "sampler_bundle")
        )
        self._chunk_cache = getattr(self, "_chunk_cache", {})

        # --profile K: capture a jax.profiler trace of ~K steps once the
        # first K steps have compiled/warmed (utils/profiling.py; view with
        # tensorboard --logdir <workspace>/profile)
        prof = {"until": None,
                "done": int(getattr(cfg, "profile", 0)) <= 0
                or not self.primary}

        def maybe_profile(step):
            if prof["done"]:
                return
            k = int(cfg.profile)
            if prof["until"] is None and step >= k:
                jax.block_until_ready(self.state.params)
                jax.profiler.start_trace(
                    os.path.join(self.workspace, "profile"))
                prof["until"] = step + k
            elif prof["until"] is not None and step >= prof["until"]:
                jax.block_until_ready(self.state.params)
                jax.profiler.stop_trace()
                prof["done"] = True
                self.log(f"[profile] trace ({k} steps) -> "
                         f"{os.path.join(self.workspace, 'profile')}")

        def log_aux(aux, step):
            loss = float(aux["loss"])
            if not np.isfinite(loss):
                # NaN/Inf sentinel (SURVEY aux row "race detection /
                # sanitizers"; the reference trains blind here).  Always
                # logged; --debug_nan 1 additionally dumps per-parameter
                # norms and aborts the run at the first bad step.
                self.log(f"[nan] non-finite loss {loss} at step {step}")
                if getattr(cfg, "debug_nan", 0):
                    dump = {
                        "step": step,
                        "aux": {k: float(v) for k, v in aux.items()
                                if np.ndim(v) == 0},
                        "param_norms": {
                            k: float(jnp.linalg.norm(v.astype(jnp.float32)))
                            for k, v in self.state.params.items()},
                    }
                    path = os.path.join(self.workspace, "nan_dump.json")
                    with open(path, "w") as f:
                        json.dump(dump, f, indent=2)
                    raise FloatingPointError(
                        f"non-finite loss at step {step}; diagnostics in "
                        f"{path} (rerun with --debug_nan 2 to trap the "
                        f"producing op via jax_debug_nans)")
            # implC_* telemetry goes to tensorboard only (reference
            # utils.py:985-989), not the console line
            extras = " ".join(
                f"{k}={float(v):.5f}" for k, v in aux.items()
                if k != "loss" and np.ndim(v) == 0
                and not k.startswith("implC_")
            )
            self.log(
                f"[train] epoch {self.epoch} step {step} "
                f"loss={loss:.5f} {extras} "
                f"({(step - start_step) / (time.time() - t_start):.2f} it/s)"
            )
            if self.writer is not None:
                for name, v in aux.items():
                    if np.ndim(v) == 0:
                        self.writer.add_scalar(f"train/{name}", float(v), step)
            return loss

        for epoch in range(self.epoch + 1, max_epoch + 1):
            self.epoch = epoch
            # no-event loss epoch gate (reference utils.py:548)
            if getattr(provider, "noev_coords", None) is not None:
                provider.use_no_ev = epoch > cfg.epoch_start_noEvLoss
            epoch_losses = []
            it = 0
            if use_chunk:
                from enerf_tpu.train.chunk import make_train_chunk
                arrs, statics = provider.sampler_bundle()
                if self._mh:
                    # dataset arrays replicate across hosts (identical on
                    # every process — same seed/dataset); the chunk's
                    # in-program sampling folds the GLOBAL lane index, so
                    # chips across hosts draw distinct batches
                    from enerf_tpu.parallel import multihost as MH
                    arrs = MH.replicate_from_host(
                        jax.tree.map(np.asarray, arrs), self.mesh)
                mode = "events" if cfg.events else "frames"

                def get_chunk(warm, frozen=False):
                    # warm: uniform fixed-step warmup windows (march off,
                    # cfg.march_warmup) — carve geometry before the march's
                    # occupancy feedback can lock in the mist mode.
                    # frozen (cfg.occ_freeze_after): stop the occupancy EMA
                    # maintenance, serve the grid as last carved.
                    from enerf_tpu.train.step import warm_statics
                    ss = warm_statics(self.ss) if warm else self.ss
                    ck = (mode, tuple(sorted(statics.items())), chunk_len,
                          self.mesh is not None, warm, frozen)
                    if ck not in self._chunk_cache:
                        self._chunk_cache[ck] = make_train_chunk(
                            ss, self.opt, mode, statics,
                            chunk_len=chunk_len,
                            use_occ=self.occupancy is not None,
                            freeze_occ=frozen,
                            density_scale=cfg.density_scale,
                            density_thresh=cfg.density_thresh,
                            mesh=self.mesh,
                        )
                    return self._chunk_cache[ck]
                emap = getattr(provider, "error_map", None)
                if self._mh and emap is not None and not (
                        hasattr(emap, "sharding")
                        and not emap.sharding.is_fully_addressable):
                    from enerf_tpu.parallel import multihost as MH
                    emap = MH.replicate_from_host(np.asarray(emap), self.mesh)
                while it + chunk_len <= steps_per_epoch:
                    key, k = jax.random.split(key)
                    freeze_at = int(getattr(cfg, "occ_freeze_after", 0))
                    chunk_fn = get_chunk(
                        global_step < int(getattr(cfg, "march_warmup", 0)),
                        frozen=freeze_at > 0 and global_step >= freeze_at)
                    self.state, self.occupancy, emap, aux = chunk_fn(
                        self.state, self.occupancy, arrs, emap, k)
                    prev = global_step
                    it += chunk_len
                    global_step += chunk_len
                    maybe_profile(global_step)
                    if global_step // cfg.log_every != prev // cfg.log_every:
                        epoch_losses.append(log_aux(aux, global_step))
                if emap is not None:
                    provider.error_map = emap
                if self.mesh is not None and it < steps_per_epoch:
                    # the dp chunk's global batch is mesh_size x the
                    # per-step path's — don't mix regimes within an epoch;
                    # round the epoch down to whole windows instead
                    if epoch == self.epoch and not getattr(
                            self, "_chunk_round_logged", False):
                        self._chunk_round_logged = True
                        self.log(
                            f"[train] mesh chunking: {steps_per_epoch} "
                            f"steps/epoch rounded down to {it} "
                            f"(whole {chunk_len}-step windows)")
                    it = steps_per_epoch
            for it in range(it, steps_per_epoch):
                occ_frozen = (
                    int(getattr(cfg, "occ_freeze_after", 0)) > 0
                    and global_step >= int(cfg.occ_freeze_after))
                if (self.occupancy is not None and global_step % 16 == 0
                        and not occ_frozen):
                    key, k = jax.random.split(key)
                    self.occupancy = update_occupancy(
                        self.state.params, self.static, self.occupancy, k,
                        density_scale=cfg.density_scale,
                        density_thresh=cfg.density_thresh,
                    )
                key, k1, k2 = jax.random.split(key, 3)
                if self._mh:
                    # distinct per-host batches; they concatenate into the
                    # global batch in _step_fn
                    k1 = jax.random.fold_in(k1, jax.process_index())
                batch = provider.train_step_batch(k1)
                aux = self._step_fn(
                    batch, k2,
                    warm=global_step < int(getattr(cfg, "march_warmup", 0)))
                if cfg.error_map and hasattr(provider, "update_error_map") and \
                        "per_ray_loss" in aux:
                    provider.update_error_map(aux["per_ray_loss"])
                global_step += 1
                maybe_profile(global_step)
                if global_step % cfg.log_every == 0:
                    epoch_losses.append(log_aux(aux, global_step))

            if epoch_losses:
                self.stats["loss"].append(float(np.mean(epoch_losses)))

            if self.primary and (
                    epoch % max(int(getattr(cfg, "ckpt_interval", 1)), 1) == 0
                    or epoch == max_epoch):
                self.ckpt.save(self.state, self.occupancy, epoch, self.stats)
            if self._mh:
                # don't let non-primary hosts race ahead of the checkpoint
                # (async saves must land before the barrier releases them)
                self.ckpt.wait()
                from enerf_tpu.parallel import multihost as MH
                MH.all_processes_barrier(f"ckpt_ep{epoch}")

            if valid_provider is not None and epoch % cfg.eval_interval == 0:
                results = self.evaluate(valid_provider)
                metric = results.get("psnr_corrected", results.get("psnr", 0.0))
                self.stats["psnr"].append(metric)
                if metric > self.best_metric:
                    self.best_metric = metric
                    self.stats["best_metric"] = float(metric)
                    if self.primary:
                        self.ckpt.save_best(
                            self.state, self.occupancy, epoch, self.stats)
                if self._eval_log(results, global_step):
                    self.log(
                        f"[guard] collapse: halting at epoch {epoch} — "
                        f"{int(getattr(cfg, 'guard_patience', 2))} "
                        f"consecutive bad evals (best corrected "
                        f"{self.best_metric:.2f} dB is checkpointed); "
                        "rerun from the best ckpt with a lower lr to "
                        "continue")
                    break
        if not prof["done"] and prof["until"] is not None:
            jax.block_until_ready(self.state.params)
            jax.profiler.stop_trace()  # run ended inside the trace window
            prof["done"] = True
        self.ckpt.wait()  # drain async checkpoint writes before returning
        self.log(f"[train] done at epoch {self.epoch}, step {global_step}")

    def _eval_log(self, results, global_step):
        """Durable eval record + divergence guard; returns True to halt.

        Durability (VERDICT r4 weak 5): if cfg.eval_log is set, append one
        JSON line per eval — point it at a git-tracked results/ file so a
        machine reset costs at most one eval interval (pair with
        scripts/commit_results.sh committing at eval cadence).

        Guard (VERDICT r4 weak 1): the R4a flagship collapsed from
        14.8 dB to 9.9 dB over 50 epochs with nobody watching, even
        though the telemetry that detects washout (affine gain `a`,
        corrected PSNR vs best) was already computed every eval.  With
        cfg.guard_collapse, guard_patience consecutive evals that are
        either >= guard_psnr_drop dB below the best corrected PSNR seen
        or (event_only) have affine a < guard_affine_a halt the run; the
        best checkpoint is already on disk.
        """
        cfg = self.cfg
        path = getattr(cfg, "eval_log", "")
        if path and self.primary:
            rec = {"ts": time.time(), "workspace": self.workspace,
                   "epoch": self.epoch, "step": int(global_step)}
            rec.update({k: (float(v) if v is not None and np.ndim(v) == 0
                            else v)
                        for k, v in results.items()})
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            with open(path, "a") as f:
                f.write(json.dumps(rec) + "\n")
        if not int(getattr(cfg, "guard_collapse", 0)):
            return False
        metric = results.get("psnr_corrected", results.get("psnr"))
        bad = False
        if metric is not None and self.best_metric > -np.inf:
            bad = metric <= self.best_metric - float(
                getattr(cfg, "guard_psnr_drop", 2.0))
        a = results.get("affine_a")
        if a is not None and float(a) < float(
                getattr(cfg, "guard_affine_a", 0.4)):
            bad = True
        self._guard_strikes = getattr(self, "_guard_strikes", 0)
        self._guard_strikes = self._guard_strikes + 1 if bad else 0
        if bad:
            self.log(f"[guard] strike {self._guard_strikes}: "
                     f"metric={metric} best={self.best_metric:.3f} "
                     f"affine_a={a}")
        return self._guard_strikes >= int(getattr(cfg, "guard_patience", 2))

    # ------------------------------------------------------------------ eval

    def render_view(self, pose, intrinsics, H, W, params=None, ema=True):
        """Full-image render -> (image [H, W, C], depth [H, W]) numpy."""
        if params is None:
            params = self.state.ema_params if ema else self.state.params
        pose = jnp.asarray(pose, jnp.float32)
        ro, rd = get_rays_full(pose, intrinsics, H, W)
        if self.occupancy is not None:
            # eval uses a deeper live-sample buffer than training (the
            # reference's inference loop runs to max_steps with no
            # mean_count cap, renderer.py:344-401) but honors the
            # configured training buffer as a floor
            eval_samples = max(2 * self.cfg.march_samples, 128)
            if self.mesh is not None:
                # multi-chip eval tiling: rays sharded over the mesh,
                # image gathered (SURVEY M5)
                if self._sharded_render is None:
                    from enerf_tpu.parallel.mesh import make_sharded_render
                    self._sharded_render = make_sharded_render(
                        self.static, self.mesh,
                        num_samples=eval_samples,
                        max_steps=self.ss.max_steps,
                        min_near=self.cfg.min_near,
                        density_scale=self.cfg.density_scale,
                        dt_gamma=self.cfg.dt_gamma,
                    )
                out = self._sharded_render(
                    params, self.occupancy.occ_bitfield, ro, rd)
            else:
                # alive-ray inference renderer (reference
                # raymarching.cu:701-938 / renderer.py:344-401 role): full
                # max_steps march depth with per-window early termination —
                # rays retire at T < 1e-4, so a raster-local chunk over sky
                # or near surfaces exits after a few 16-sample windows
                # instead of paying the fixed eval-depth live buffer.
                # Chunking at max_ray_batch bounds the per-call field eval.
                chunk = min(int(self.cfg.max_ray_batch), ro.shape[0])
                outs = {"image": [], "depth": []}
                for s in range(0, ro.shape[0], chunk):
                    co, cd = ro[s:s + chunk], rd[s:s + chunk]
                    pad = chunk - co.shape[0]
                    if pad:
                        co = jnp.concatenate([co, jnp.tile(co[-1:], (pad, 1))])
                        cd = jnp.concatenate([cd, jnp.tile(cd[-1:], (pad, 1))])
                    o = render_rays_infer(
                        params, self.static, self.occupancy.occ_bitfield,
                        co, cd,
                        block=16,
                        max_steps=self.ss.max_steps, bg_color=1.0,
                        min_near=self.cfg.min_near,
                        density_scale=self.cfg.density_scale,
                        dt_gamma=self.cfg.dt_gamma,
                    )
                    n = chunk - pad
                    outs["image"].append(np.asarray(o["image"][:n]))
                    outs["depth"].append(np.asarray(o["depth"][:n]))
                out = {k: np.concatenate(v) for k, v in outs.items()}
        else:
            out = render_rays_staged(
                params, self.static, ro, rd,
                max_ray_batch=self.cfg.max_ray_batch,
                num_steps=self.cfg.num_steps,
                upsample_steps=self.cfg.upsample_steps,
                bg_color=1.0, perturb=False, train=False,
                min_near=self.cfg.min_near, density_scale=self.cfg.density_scale,
            )
        C = self.static.out_dim_color
        img = np.asarray(out["image"]).reshape(H, W, C)
        depth = np.asarray(out["depth"]).reshape(H, W)
        return img, depth

    def evaluate(self, provider, save=True):
        """Reference evaluate_one_epoch incl. event-only (a,b) correction.

        Multi-host: every process renders (the sharded render is a
        collective program), only process 0 writes images.
        """
        save = save and self.primary
        if self.occupancy is not None:
            # mist telemetry (VERDICT r4 item 1): track what the march's
            # occupancy feedback has done to the grid at every eval
            occ_frac = float(jnp.mean(
                self.occupancy.occ_bitfield.astype(jnp.float32)))
            self.log(f"[occ] occupied fraction {occ_frac:.4f} "
                     f"mean_density {float(self.occupancy.mean_density):.5f}")
        views = provider.val_views()
        preds, gts, depths = [], [], []
        for v in views:
            img, depth = self.render_view(v["pose"], v["intrinsics"], v["H"], v["W"])
            preds.append(img)
            depths.append(depth)
            gts.append(np.asarray(v["gt"]) if v.get("gt") is not None else None)

        results = {}
        have_gt = [i for i, g in enumerate(gts) if g is not None]
        if have_gt:
            psnrs = [M.psnr(preds[i], gts[i]) for i in have_gt]
            ssims = [M.ssim(preds[i], gts[i]) for i in have_gt]
            results["psnr"] = float(np.mean(psnrs))
            results["ssim"] = float(np.mean(ssims))
            # per-image LPIPS averaged over the val set (reference
            # utils.py:1096-1112 computes alex+vgg per image)
            lp = [M.compute_lpips(preds[i], gts[i],
                                  self.static.out_dim_color)
                  for i in have_gt]
            suf = M.lpips_label()
            las = [a for a, _ in lp if a is not None]
            lvs = [v for _, v in lp if v is not None]
            results[f"lpips_alex{suf}"] = float(np.mean(las)) if las else None
            results[f"lpips_vgg{suf}"] = float(np.mean(lvs)) if lvs else None

        if self.cfg.event_only and have_gt:
            # affine log correction over ALL val images (utils.py:1170-1265)
            def to_log(im):
                x = im
                if self.static.out_dim_color == 3:
                    x = np.asarray(rgb_to_luma(jnp.asarray(x)))
                return np.log(255.0 * x + 1e-3)

            p_logs = np.stack([to_log(preds[i]) for i in have_gt])
            g_logs = np.stack([to_log(gts[i]) for i in have_gt])
            a, b = M.solve_normal_equations(p_logs, g_logs)
            results["affine_a"], results["affine_b"] = a, b
            psnrs_c, ssims_c = [], []
            for j, i in enumerate(have_gt):
                pred_c = np.exp(p_logs[j] * a + b)
                gt255 = np.exp(g_logs[j])
                psnrs_c.append(M.psnr(pred_c, gt255, max_val=255.0))
                ssims_c.append(M.ssim(pred_c[..., 0], gt255[..., 0], data_range=255.0))
            results["psnr_corrected"] = float(np.mean(psnrs_c))
            results["ssim_corrected"] = float(np.mean(ssims_c))

        if save:
            import cv2
            vdir = os.path.join(self.workspace, "validation")
            for sub in ("prediction", "depth", "gt"):
                os.makedirs(os.path.join(vdir, sub), exist_ok=True)
            for j, (p, d) in enumerate(zip(preds, depths)):
                img8 = (np.clip(p, 0, 1) * 255).astype(np.uint8)
                if img8.shape[-1] == 3:
                    img8 = cv2.cvtColor(img8, cv2.COLOR_RGB2BGR)
                cv2.imwrite(os.path.join(vdir, "prediction", f"ep{self.epoch:04d}_{j:04d}.png"), img8)
                cv2.imwrite(os.path.join(vdir, "depth", f"ep{self.epoch:04d}_{j:04d}.png"),
                            (np.clip(d, 0, 1) * 255).astype(np.uint8))
                if gts[j] is not None:
                    g8 = (np.clip(gts[j], 0, 1) * 255).astype(np.uint8)
                    if g8.shape[-1] == 3:
                        g8 = cv2.cvtColor(g8, cv2.COLOR_RGB2BGR)
                    cv2.imwrite(os.path.join(vdir, "gt", f"{j:04d}.png"), g8)

        # stereo event-camera views (tumvie/eds, reference utils.py:1186-1255):
        # rendered + saved, optionally affine-corrected; no GT metrics
        stereo = getattr(provider, "stereo_views", None)
        if self.cfg.eval_stereo_views and stereo and save:
            import cv2
            evdir = os.path.join(self.workspace, "validation", "event_view")
            os.makedirs(evdir, exist_ok=True)
            a = results.get("affine_a")
            b = results.get("affine_b")
            for j, v in enumerate(stereo):
                img, depth = self.render_view(v["pose"], v["intrinsics"], v["H"], v["W"])
                np.save(os.path.join(evdir, f"ep{self.epoch:04d}_{j:04d}_raw.npy"), img)
                if a is not None:
                    lum = img if img.shape[-1] == 1 else np.asarray(
                        rgb_to_luma(jnp.asarray(img)))
                    img8 = np.clip(np.exp(np.log(255.0 * lum + 1e-3) * a + b), 0, 255)
                    img8 = np.rint(img8).astype(np.uint8)[..., 0]
                else:
                    img8 = (np.clip(img[..., 0], 0, 1) * 255).astype(np.uint8)
                cv2.imwrite(os.path.join(evdir, f"ep{self.epoch:04d}_{j:04d}.png"), img8)
                cv2.imwrite(os.path.join(evdir, f"ep{self.epoch:04d}_{j:04d}_depth.png"),
                            (np.clip(depth, 0, 1) * 255).astype(np.uint8))

        self.log(f"[eval] epoch {self.epoch}: " +
                 " ".join(f"{k}={v}" for k, v in results.items()))
        if self.writer is not None:
            for k, v in results.items():
                if v is not None and np.ndim(v) == 0:
                    self.writer.add_scalar(f"eval/{k}", float(v), int(self.state.step))
        return results

    def test(self, provider, out_dir=None):
        """Render test poses to disk (reference Trainer.test)."""
        import cv2
        out_dir = out_dir or os.path.join(self.workspace, "results")
        os.makedirs(out_dir, exist_ok=True)
        for j, v in enumerate(provider.test_views()):
            img, depth = self.render_view(v["pose"], v["intrinsics"], v["H"], v["W"])
            if not self.primary:
                continue  # all processes render (collective), rank 0 writes
            img8 = (np.clip(img, 0, 1) * 255).astype(np.uint8)
            if img8.shape[-1] == 3:
                img8 = cv2.cvtColor(img8, cv2.COLOR_RGB2BGR)
            cv2.imwrite(os.path.join(out_dir, f"{j:04d}.png"), img8)
            cv2.imwrite(os.path.join(out_dir, f"{j:04d}_depth.png"),
                        (np.clip(depth, 0, 1) * 255).astype(np.uint8))
            np.save(os.path.join(out_dir, f"{j:04d}_raw.npy"), img)
        self.log(f"[test] wrote renders to {out_dir}")

    def save_mesh(self, path=None, resolution=256, threshold=10.0):
        """Density isosurface export (reference save_mesh, utils.py:712-732)."""
        if not self.primary:
            return None  # single-device query + file write: rank 0 only
        from enerf_tpu.utils.mesh import extract_geometry, write_obj, write_ply
        path = path or os.path.join(self.workspace, "meshes",
                                    f"{self.cfg.expname}_ep{self.epoch:04d}.obj")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        b = self.static.bound
        params = self.state.ema_params

        def q(pts):
            sigma, _ = field_density(params, self.static, jnp.asarray(pts))
            return np.asarray(sigma)

        verts, tris = extract_geometry(
            [-b] * 3, [b] * 3, resolution, threshold, q
        )
        if path.endswith(".ply"):
            write_ply(path, verts, tris)
        else:
            write_obj(path, verts, tris)
        self.log(f"[mesh] {len(verts)} verts / {len(tris)} tris -> {path}")
        return path
