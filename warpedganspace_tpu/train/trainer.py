"""Trainer: orchestration around the jitted train step.

Behavioral parity with reference ``lib/trainer.py``:

- experiments/wip/<EXP_DIR>/ working tree with models/, stats.json, optional
  tensorboard/ (:36-63); finished runs copied to experiments/complete/ with
  checkpoint.pt excluded (:169-177, :302-319).
- checkpoint.pt = {'iter', 'support_sets': state_dict, 'reconstructor':
  state_dict} written every ckp_freq iterations (:288-295); resume loads it and
  restarts at the stored iteration (:74-89). The reference does NOT checkpoint
  optimizer state (Adam moments reset on resume); we additionally persist the
  optax states in a sidecar ``optimizer_state.npz`` and restore them when
  present — a documented fix, removable by deleting the sidecar.
- stats.json: {iteration: {accuracy, classification_loss, regression_loss,
  total_loss}} rewritten whole-file every log_freq (:101-112); same stdout
  progress block (:114-127); same final support_sets.pt / reconstructor.pt
  exports in reference-compatible torch format (:302-308).

TPU-specific behavior: metric device->host transfers are deferred to the log
boundary so the accelerator stream never stalls mid-window; iteration wall
times are therefore measured per log window (the printed mean iter time is the
window mean, which is also what the reference effectively reports).

Multi-process (jax.distributed over DCN, SURVEY §2.5): every process runs the
SPMD train step over the global mesh, but ONLY process 0 owns side effects —
stats.json, checkpoint.pt + sidecar, TensorBoard, final .pt exports, the
wip->complete copy and stdout (the reference is single-process, so this gating
is the multi-host generalization of its implicit single-writer behavior,
lib/trainer.py:162-166). The 'orbax' checkpoint backend stays collective (all
processes participate — it is sharded-array aware). Host-local inputs (frozen
G params, the train state, the seed key) are replicated into global arrays
before the first step; resume reads happen on every process (shared-filesystem
assumption, standard for pod training), writes only on process 0, with a
cross-process barrier before the completed tree is consumed downstream.
"""
from __future__ import annotations

import json
import os
import os.path as osp
import shutil
import sys
import time

import numpy as np

import jax

from warpedganspace_tpu.convert import (
    lenet_reconstructor_from_state_dict,
    lenet_reconstructor_to_state_dict,
    resnet_reconstructor_from_state_dict,
    resnet_reconstructor_to_state_dict,
)
from warpedganspace_tpu.core.stats import TrainingStatTracker
from warpedganspace_tpu.parallel.mesh import (
    assert_identical_across_processes,
    is_coordinator,
    replicate_to_global,
    sync_processes,
)
from warpedganspace_tpu.train.train_step import (
    TrainStepConfig,
    init_train_state,
    make_train_step,
    make_train_step_scan,
)
from warpedganspace_tpu.utils.aux import sec2dhms, update_progress, update_stdout
from warpedganspace_tpu.utils.io import load_pt, save_pt


def _reconstructor_sd(rtype: str, params):
    if rtype == "LeNet":
        return lenet_reconstructor_to_state_dict(params)
    return resnet_reconstructor_to_state_dict(params)


def _reconstructor_from_sd(rtype: str, sd):
    if rtype == "LeNet":
        return lenet_reconstructor_from_state_dict(sd)
    return resnet_reconstructor_from_state_dict(sd)


class Trainer:
    """Owns the experiment directory tree, checkpointing, stats and the loop."""

    def __init__(self, params=None, exp_dir=None, mesh=None, seed: int = 0, root: str = "experiments"):
        if params is None:
            raise ValueError("Cannot build a Trainer instance with empty params")
        self.params = params
        self.mesh = mesh
        self.seed = seed
        # Single side-effect owner of a multi-process run (see module docstring).
        self.is_coord = is_coordinator()

        self.wip_dir = osp.join(root, "wip", exp_dir)
        self.complete_dir = osp.join(root, "complete", exp_dir)

        self.stats_json = osp.join(self.wip_dir, "stats.json")
        os.makedirs(self.wip_dir, exist_ok=True)
        if self.is_coord and not osp.isfile(self.stats_json):
            with open(self.stats_json, "w") as f:
                json.dump({}, f)

        self.models_dir = osp.join(self.wip_dir, "models")
        os.makedirs(self.models_dir, exist_ok=True)
        self.checkpoint = osp.join(self.models_dir, "checkpoint.pt")
        self.opt_sidecar = osp.join(self.models_dir, "optimizer_state.npz")
        # 'pt' = reference-format checkpoint.pt + optimizer sidecar;
        # 'orbax' = TPU-native manager (atomic, sharded-array aware).
        self.checkpoint_backend = getattr(params, "checkpoint_backend", "pt")
        if self.checkpoint_backend not in ("pt", "orbax"):
            raise ValueError(f"unknown checkpoint backend {self.checkpoint_backend!r}")

        self.tensorboard = bool(getattr(self.params, "tensorboard", False))
        self.tb_writer = None
        if self.tensorboard and not self.is_coord:
            self.tensorboard = False  # scalar logging is coordinator-owned
        if self.tensorboard:
            self.tb_dir = osp.join(self.wip_dir, "tensorboard")
            os.makedirs(self.tb_dir, exist_ok=True)
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.tb_writer = SummaryWriter(log_dir=self.tb_dir)
            except Exception as e:  # tensorboard not installed — degrade quietly
                print(f"#. Warning: TensorBoard unavailable ({e}); scalar logging disabled")
                self.tb_writer = None
            # In-process TensorBoard server, like the reference
            # (lib/trainer.py:55-63). Best-effort: port conflicts / missing
            # package must not kill a training run.
            if self.tb_writer is not None and not getattr(
                self.params, "no_tensorboard_server", False
            ):
                try:
                    from tensorboard import program

                    tb = program.TensorBoard()
                    tb.configure(argv=[None, "--logdir", self.tb_dir, "--port", "0"])
                    print("#. Start TensorBoard at {}".format(tb.launch()))
                except Exception as e:
                    print(f"#. Warning: TensorBoard server not started ({e})")

        self.stat_tracker = TrainingStatTracker()

    # ------------------------------------------------------------- checkpoints
    def _orbax_manager(self):
        """CheckpointManager for the 'orbax' backend (created lazily)."""
        if getattr(self, "_orbax_mgr", None) is None:
            import orbax.checkpoint as ocp

            self._orbax_mgr = ocp.CheckpointManager(
                osp.abspath(osp.join(self.models_dir, "orbax")),
                options=ocp.CheckpointManagerOptions(max_to_keep=2),
            )
        return self._orbax_mgr

    def save_checkpoint(self, iteration: int, S, state):
        if self.checkpoint_backend == "orbax":
            # TPU-native path: atomic, pickle-free, and — unlike the .pt +
            # sidecar pair — handles sharded jax.Arrays natively, so the SAME
            # call works under multi-host DCN training. The reference-format
            # final .pt exports (support_sets.pt etc.) are still written when
            # training completes, so the downstream pipeline is unaffected.
            import orbax.checkpoint as ocp

            mgr = self._orbax_manager()
            mgr.save(iteration, args=ocp.args.StandardSave(state))
            # Orbax saves asynchronously; finalize before returning so a crash
            # right after save_checkpoint can always resume from this step
            # (same durability contract as the reference's synchronous
            # torch.save).
            mgr.wait_until_finished()
            return
        if not self.is_coord:
            # The 'pt' backend is a host-side pickle of the (fully replicated)
            # trainables — one writer suffices and two would race on the same
            # shared-filesystem path.
            return
        save_pt(
            {
                "iter": iteration,
                "support_sets": S.to_torch_state_dict(state["s_params"]),
                "reconstructor": _reconstructor_sd(
                    self.params.reconstructor_type, state["r_params"]
                ),
            },
            self.checkpoint,
        )
        # Optax states (fix-with-note; reference resets Adam moments on resume).
        # Tagged with the iteration and written atomically so a crash between
        # the two files can never resume with mismatched Adam moments.
        leaves = jax.tree_util.tree_leaves(
            {"opt_s": state["opt_s"], "opt_r": state["opt_r"]}
        )
        tmp = self.opt_sidecar + ".tmp"
        with open(tmp, "wb") as f:
            np.savez(
                f,
                iter=np.asarray(iteration),
                **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)},
            )
        os.replace(tmp, self.opt_sidecar)

    def get_starting_iteration(self, S, state) -> tuple[int, dict]:
        """Resume from checkpoint.pt (reference trainer.py:74-89) or, with the
        orbax backend, from the newest orbax step."""
        if self.checkpoint_backend == "orbax":
            if not osp.isdir(osp.join(self.models_dir, "orbax")):
                return 1, state
            import orbax.checkpoint as ocp

            mgr = self._orbax_manager()
            step = mgr.latest_step()
            if step is None:
                return 1, state
            # Under --multi-device, restore REPLICATED over the mesh: the
            # fresh-init state is uncommitted (eager outputs) so the sharded
            # step can place it freely, but orbax restores committed arrays —
            # restoring to the pre-restore single-device sharding would then
            # clash with the step's 8-device constraints on resume.
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec

                rep = NamedSharding(self.mesh, PartitionSpec())
                shard_of = lambda x: rep  # noqa: E731
            else:
                shard_of = lambda x: getattr(x, "sharding", None)  # noqa: E731
            abstract = jax.tree_util.tree_map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype,
                                               sharding=shard_of(x)),
                state)
            restored = mgr.restore(step, args=ocp.args.StandardRestore(abstract))
            return int(step), restored
        if not osp.isfile(self.checkpoint):
            return 1, state
        ckpt = load_pt(self.checkpoint)
        state = dict(state)
        state["s_params"] = S.from_torch_state_dict(ckpt["support_sets"])
        state["r_params"] = _reconstructor_from_sd(
            self.params.reconstructor_type, ckpt["reconstructor"]
        )
        if osp.isfile(self.opt_sidecar):
            try:
                with np.load(self.opt_sidecar) as blob:
                    side_iter = int(blob["iter"])
                    if side_iter != int(ckpt["iter"]):
                        raise ValueError(
                            f"sidecar is from iteration {side_iter}, "
                            f"checkpoint from {int(ckpt['iter'])}"
                        )
                    leaves = [blob[f"leaf_{i}"] for i in range(len(blob.files) - 1)]
                ref = {"opt_s": state["opt_s"], "opt_r": state["opt_r"]}
                treedef = jax.tree_util.tree_structure(ref)
                restored = jax.tree_util.tree_unflatten(treedef, leaves)
                state["opt_s"], state["opt_r"] = restored["opt_s"], restored["opt_r"]
            except Exception as e:
                if jax.process_count() > 1:
                    # Under multi-process SPMD every host must restore the SAME
                    # moments; a per-host silent reset would diverge the
                    # "identical by construction" state replicate_to_global
                    # assumes. Fail hard (the cross-process fingerprint check
                    # in train() is the backstop for other divergences).
                    raise RuntimeError(
                        f"optimizer sidecar restore failed on process "
                        f"{jax.process_index()} ({e}); delete "
                        f"{self.opt_sidecar} on EVERY host to reset moments"
                    ) from e
                print(f"#. Warning: could not restore optimizer sidecar ({e}); Adam moments reset")
        return int(ckpt["iter"]), state

    # ------------------------------------------------------------------- stats
    def log_progress(self, iteration, mean_iter_time, elapsed_time, eta):
        if not self.is_coord:
            self.stat_tracker.flush()
            return
        stats = self.stat_tracker.get_means()
        with open(self.stats_json) as f:
            stats_dict = json.load(f)
        stats_dict.update({iteration: stats})
        with open(self.stats_json, "w") as f:
            json.dump(stats_dict, f)
        self.stat_tracker.flush()

        update_progress(
            "  \\__.Training [bs: {}] [iter: {:06d}/{:06d}] ".format(
                self.params.batch_size, iteration, self.params.max_iter
            ),
            self.params.max_iter,
            iteration + 1,
        )
        if iteration < self.params.max_iter - 1:
            print()
        print("      \\__Batch accuracy      : {:.03f}".format(stats["accuracy"]))
        print("      \\__Classification loss : {:.08f}".format(stats["classification_loss"]))
        print("      \\__Regression loss     : {:.08f}".format(stats["regression_loss"]))
        print("      \\__Total loss          : {:.08f}".format(stats["total_loss"]))
        print("         ===================================================================")
        print("      \\__Mean iter time      : {:.3f} sec".format(mean_iter_time))
        print("      \\__Elapsed time        : {}".format(sec2dhms(elapsed_time)))
        print("      \\__ETA                 : {}".format(sec2dhms(eta)))
        print("         ===================================================================")
        update_stdout(10)

    # ------------------------------------------------------------------- train
    def train(self, generator, support_sets, reconstructor, profile: bool = False):
        """Run the contrastive training loop (reference trainer.py:129-319).

        Args:
            generator:     GeneratorBundle (frozen).
            support_sets:  SupportSets config.
            reconstructor: Reconstructor config.
        """
        p = self.params
        pair_layout = getattr(p, "pair_layout", "auto")
        s2d_ok = (generator.supports_s2d_out
                  and reconstructor.reconstructor_type == "ResNet")
        if pair_layout == "auto":
            pair_layout = "s2d" if s2d_ok else "nhwc"
        elif pair_layout == "s2d" and not s2d_ok:
            print("  \\__pair-layout s2d unavailable for this G/R combination "
                  "-- falling back to nhwc")
            pair_layout = "nhwc"
        cfg = TrainStepConfig(
            batch_size=p.batch_size,
            num_support_sets=p.num_support_sets,
            min_shift_magnitude=p.min_shift_magnitude,
            max_shift_magnitude=p.max_shift_magnitude,
            lambda_cls=p.lambda_cls,
            lambda_reg=p.lambda_reg,
            support_set_lr=p.support_set_lr,
            reconstructor_lr=p.reconstructor_lr,
            z_truncation=getattr(p, "z_truncation", None),
            shift_in_w_space=bool(getattr(p, "shift_in_w_space", False)),
            generator_dtype=getattr(p, "g_dtype", "float32"),
            reconstructor_dtype=getattr(p, "r_dtype", "float32"),
            pair_layout=pair_layout,
        )

        multiproc = self.mesh is not None and jax.process_count() > 1

        seed_key = jax.random.key(self.seed)
        state = init_train_state(seed_key, generator, support_sets, reconstructor, cfg)

        # Save initial support sets (reference trainer.py:139).
        if self.is_coord:
            save_pt(
                support_sets.to_torch_state_dict(state["s_params"]),
                osp.join(self.models_dir, "support_sets_init.pt"),
            )

        starting_iter, state = self.get_starting_iteration(support_sets, state)

        if starting_iter == p.max_iter:
            if self.is_coord:
                print("#. This experiment has already been completed and can be found @ {}".format(self.wip_dir))
                print("#. Copy {} to {}...".format(self.wip_dir, self.complete_dir))
                try:
                    shutil.copytree(
                        src=self.wip_dir,
                        dst=self.complete_dir,
                        ignore=shutil.ignore_patterns("checkpoint.pt", "orbax"),
                    )
                    print("  \\__Done!")
                except (IOError, FileExistsError) as e:
                    print("  \\__Already exists -- {}".format(e))
            sync_processes("trainer-already-complete")
            sys.exit()
        if self.is_coord:
            print("#. Start training from iteration {}".format(starting_iter))

        if multiproc:
            # Every process built/loaded an identical host-local copy of the
            # state (same seed / same checkpoint bytes); the global-mesh step
            # needs them as fully-replicated GLOBAL arrays (a process-local
            # committed array cannot feed an SPMD program spanning processes).
            # VERIFY the identity first — a torn read on one host would
            # otherwise replicate divergent state with no error.
            assert_identical_across_processes(state, "train state")
            state = replicate_to_global(state, self.mesh)
            from jax.sharding import NamedSharding, PartitionSpec

            seed_key = jax.jit(
                jax.random.key,
                out_shardings=NamedSharding(self.mesh, PartitionSpec()),
            )(self.seed)

        # k-step dispatch chunking (--steps-per-call): runs k iterations per
        # XLA program (lax.scan) — same sample stream and best-case rate as
        # single dispatch, but one Python dispatch + metric fetch per k
        # iterations pins the deep-queue regime on slow/contended hosts
        # (PERFORMANCE.md round-4 SNGAN dispatch-window analysis).
        # Checkpoints land on chunk boundaries (ckp_freq % k == 0 enforced);
        # mis-phased head/tail iterations (resume re-run, final partial
        # chunk) fall back to the single-step program.
        k_chunk = int(getattr(p, "steps_per_call", 1) or 1)
        step = make_train_step(generator, support_sets, reconstructor, cfg, mesh=self.mesh)
        step_chunk = None
        if k_chunk > 1:
            if p.ckp_freq % k_chunk:
                raise ValueError(
                    f"--steps-per-call {k_chunk} must divide --ckp-freq "
                    f"{p.ckp_freq} (checkpoints only exist at chunk boundaries)")
            if p.log_freq % k_chunk:
                raise ValueError(
                    f"--steps-per-call {k_chunk} must divide --log-freq "
                    f"{p.log_freq} (per-window iteration timing)")
            step_chunk = make_train_step_scan(
                generator, support_sets, reconstructor, cfg, mesh=self.mesh,
                k=k_chunk)
        g_params = generator.params
        if multiproc:
            g_params = replicate_to_global(g_params, self.mesh)
        if cfg.generator_dtype == "bfloat16":
            # Cast the frozen params ONCE here; the in-step cast then traces to
            # identity ops (XLA elides same-dtype astype).
            from warpedganspace_tpu.models.api import cast_params_bf16

            g_params = cast_params_bf16(g_params)

        if profile:
            jax.profiler.start_trace(osp.join(self.wip_dir, "profile"))

        t0 = time.time()
        window_t0 = t0
        window_iters = 0
        pending = []  # (start_iter, count, stacked metrics) — fetched at the log boundary

        iteration = starting_iter
        while iteration <= p.max_iter:
            # Chunked dispatch only on (iteration-1) % k boundaries with a
            # full chunk ahead; otherwise one plain step (keeps checkpoint
            # phase identical to the reference loop on fresh AND resumed runs).
            # The stacked per-chunk metrics stay ON DEVICE as one dict until
            # the log boundary (slicing mk[n][j] here would issue k*num_metric
            # tiny dispatches per chunk — the very host overhead the chunking
            # exists to remove); log/ckp boundaries can only land on chunk
            # ends (log_freq % k == 0 and ckp_freq % k == 0 are enforced).
            if (step_chunk is not None and (iteration - 1) % k_chunk == 0
                    and iteration + k_chunk - 1 <= p.max_iter):
                state, last_metrics = step_chunk(state, g_params, seed_key, iteration)
                n_advance = k_chunk
            else:
                state, last_metrics = step(state, g_params, seed_key, iteration)
                n_advance = 1
            pending.append((iteration, n_advance, last_metrics))
            window_iters += n_advance
            iteration += n_advance - 1  # -> the chunk's final iteration

            if iteration % p.log_freq == 0:
                # Force completion of the window, then account wall time.
                jax.block_until_ready(last_metrics)
                for start_it, cnt, m in pending:
                    # One D2H fetch per metric per dispatch (a (k,) column for
                    # chunks, a scalar for single steps).
                    cols = {k: np.asarray(v).reshape(cnt) for k, v in m.items()}
                    for j in range(cnt):
                        host = {k: float(cols[k][j]) for k in cols}
                        self.stat_tracker.update(**host)
                        if self.tb_writer is not None:
                            # Each buffered iteration at its own global step
                            # (reference trainer.py:264-266).
                            for k, v in host.items():
                                self.tb_writer.add_scalar(k, v, start_it + j)
                pending = []
                now = time.time()
                mean_iter_time = (now - window_t0) / max(window_iters, 1)
                window_t0, window_iters = now, 0
                elapsed = now - t0
                eta = elapsed * ((p.max_iter - iteration) / max(iteration - starting_iter + 1, 1))
                self.log_progress(iteration, mean_iter_time, elapsed, eta)

            if iteration % p.ckp_freq == 0:
                # Checkpoint iterations land on chunk boundaries
                # (ckp_freq % steps_per_call == 0), where `state` is the
                # post-iteration state exactly as in the unchunked loop.
                jax.block_until_ready(state["s_params"])
                self.save_checkpoint(iteration, support_sets, state)

            iteration += 1

        if profile:
            jax.profiler.stop_trace()

        elapsed = time.time() - t0

        if self.is_coord:
            # Final model exports (reference trainer.py:302-308).
            save_pt(
                support_sets.to_torch_state_dict(state["s_params"]),
                osp.join(self.models_dir, "support_sets.pt"),
            )
            save_pt(
                _reconstructor_sd(p.reconstructor_type, state["r_params"]),
                osp.join(self.models_dir, "reconstructor.pt"),
            )

            for _ in range(10):
                print()
            print("#.Training completed -- Total elapsed time: {}.".format(sec2dhms(elapsed)))
            print("#. Copy {} to {}...".format(self.wip_dir, self.complete_dir))
            try:
                shutil.copytree(
                    src=self.wip_dir,
                    dst=self.complete_dir,
                    ignore=shutil.ignore_patterns("checkpoint.pt", "orbax"),
                )
                print("  \\__Done!")
            except (IOError, FileExistsError) as e:
                print("  \\__Already exists -- {}".format(e))
        # Downstream stages (traverse/eval) read the complete tree: hold every
        # process here until the coordinator finished writing it.
        sync_processes("trainer-complete")
        return state
