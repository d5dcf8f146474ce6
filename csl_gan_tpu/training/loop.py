"""Training orchestration: the host-side loop around the jitted steps.

Equivalent of the reference train.py script body (train.py:30-603): setup,
warmup on public/mean data, the epoch/batch loop with n_d_steps and
train-D-until-threshold gating, interval logging/sampling, per-epoch privacy
logging with epsilon-budget early stop, and checkpointing.

Perf-relevant differences from the reference (SURVEY.md §7):
  - all metric accumulation stays on-device and async; the host syncs only at
    log intervals (the reference `.item()`s every batch, train.py:488-500);
  - the G->D handoff needs no device copies — one compiled step, one mesh;
  - `privacy_engine.steps` lives in an explicit accountant that is saved and
    restored with the D checkpoint (fixes resume undercount, SURVEY.md §5.3).
"""

from __future__ import annotations

import csv
import glob
import os
import shutil
import signal
import threading
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from csl_gan_tpu import options as options_mod
from csl_gan_tpu.data import init_data
from csl_gan_tpu.data.loader import ArrayDataset, Loader
from csl_gan_tpu.models.registry import init_models
from csl_gan_tpu.options import opt_get
from csl_gan_tpu.parallel import make_mesh
from csl_gan_tpu.privacy import accountant_from_state_dict, make_accountant
from csl_gan_tpu.privacy.mean_sampler import MeanSampler
from csl_gan_tpu.training import checkpoint, param_order
from csl_gan_tpu.training.logger import build_logger
from csl_gan_tpu.training.steps import TrainStepBuilder
from csl_gan_tpu.utils.images import denorm_celeba, save_image_grid


def snapshot_code(output_dir: str) -> None:
    """Copy the framework sources into output_dir/code (train.py:40-44)."""
    dst = os.path.join(output_dir, "code")
    os.makedirs(dst, exist_ok=True)
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    repo_root = os.path.dirname(pkg_root)
    for f in glob.glob(os.path.join(repo_root, "*.py")):
        shutil.copy2(f, dst)
    pkg_dst = os.path.join(dst, "csl_gan_tpu")
    if os.path.isdir(pkg_dst):
        shutil.rmtree(pkg_dst)
    shutil.copytree(pkg_root, pkg_dst,
                    ignore=shutil.ignore_patterns("__pycache__"))


class Trainer:
    def __init__(self, opt):
        self.opt = opt
        options_mod.save_opt(opt, os.path.join(opt.output_dir, "opt.txt"))
        if opt.resume_path is None:
            snapshot_code(opt.output_dir)

        # Backprop clipping: derived per-parameter grad bounds become the DP
        # clipping parameters (reference train.py:84-92; x batch_size because
        # summed per-sample grads are compared against them).
        if opt_get(opt, "backprop_clip", False):
            from csl_gan_tpu.ops.backprop_clip import bpc_config_for
            cfg = bpc_config_for(opt)
            opt.clipping_param_per_layer = [c * opt.batch_size
                                            for c in cfg.grad_l2_bounds]
            # The BPC-derived vector is authoritative: mark it user-set so
            # steps._per_layer_vector applies it verbatim instead of
            # rebuilding a dataset default.
            opt.cpl_user_set = True
            opt.clipping_param = float(np.linalg.norm(opt.clipping_param_per_layer))
            print("BPC L2 Bounds:", cfg.grad_l2_bounds)
            print("BPC Backprop Clipping Params:", cfg.back_clip_params)
            print("BPC Forward Clipping Params:", cfg.input_clip_params)

        (self.G, G_vars), (self.D, D_vars) = init_models(opt)
        self.dataset, self.dataloader, self.public_dataset, self.public_dataloader = \
            init_data(opt)

        # CelebA production path: decode once into a uint8 cache, train from
        # a device-resident copy with on-device normalize + random flip (the
        # per-image host JPEG decode would otherwise bottleneck the ~2 ms
        # step). The host fallback applies the same transform in numpy.
        self._uint8_images = False
        if opt.dataset == "CelebA" and not opt_get(opt, "host_loop", False):
            # -nw/--num_workers maps to the native decoder's thread count
            # (the reference's DataLoader worker knob, init_util.py:39).
            u8, cache_labels = self.dataset.decoded_cache(
                n_threads=opt_get(opt, "num_workers", 0) or 0)
            flip_rng = np.random.default_rng(opt.manual_seed + 13)

            def host_transform(batch):
                x = np.asarray(batch, np.float32) / 127.5 - 1.0
                fl = flip_rng.random(len(x)) < 0.5
                x[fl] = x[fl, :, ::-1, :]
                return x

            cached = ArrayDataset(u8, cache_labels, transform=host_transform)
            cached.label_true_count = self.dataset.label_true_count
            self.dataset = cached
            self.dataloader = Loader(cached, opt.batch_size, shuffle=True,
                                     seed=opt.manual_seed)
            self._uint8_images = True

        # Mean sampler (public surrogate data, train.py:53-73).
        self.mean_sampler = None
        self.mean_sample_privacy_cost = 0.0
        if opt.num_mean_samples > 0:
            print("Generating mean samples...")
            n_cls = opt.n_classes if opt.conditional else 1
            mean_loader = Loader(self.dataset,
                                 batch_size=opt.mean_sample_size * n_cls,
                                 shuffle=True, seed=opt.manual_seed + 7)
            if opt.dataset == "CelebA" and opt.conditional:
                scs = min(self.dataset.label_true_count,
                          opt.train_set_size - self.dataset.label_true_count)
            elif opt.conditional:
                scs = opt.train_set_size / opt.n_classes
            else:
                scs = None
            im_res = 28 if opt.dataset == "MNIST" else opt.im_size
            im_ch = 1 if opt.dataset == "MNIST" else 3
            self.mean_sampler = MeanSampler(
                dataloader=mean_loader, dataset_size=opt.train_set_size,
                save_path=os.path.join(opt.output_dir, "mean_samples"),
                noise_std=opt.mean_sample_noise_std,
                num_samples=opt.num_mean_samples,
                mean_size=opt.mean_sample_size,
                default_batch_size=opt.batch_size,
                res=im_res, ch=im_ch,
                n_classes=n_cls if opt.conditional else 1,
                smallest_class_size=scs, seed=opt.manual_seed + 11)
            self.mean_sample_privacy_cost, _ = \
                self.mean_sampler.get_privacy_cost(target_delta=opt.delta)
            print("Privacy Cost from Mean Samples:", self.mean_sample_privacy_cost)

        label1_prob = 0.5
        if opt.dataset == "CelebA" and opt.conditional and \
                self.dataset.label_true_count is not None:
            label1_prob = self.dataset.label_true_count / opt.train_set_size

        self.builder = TrainStepBuilder(opt, self.G, self.D, label1_prob)
        self.state = self.builder.init_state(G_vars, D_vars)
        self.mesh = make_mesh(opt)
        self._torch_idx = np.asarray(
            param_order.torch_order_indices(D_vars["params"]))
        # Commit the state to the mesh up-front (replicated, or sharded
        # under --fsdp/--tp) so the first step compiles once (uncommitted
        # args would otherwise trigger a second compile when outputs come
        # back committed). Under --fsdp/--tp the builder's steps also pin
        # their output state to the same leaf shardings.
        if self.mesh.state_sharded:
            self.builder._constrain_state = self.mesh.constrain_state
        self.state = self.mesh.put_state(self.state)
        self._setup_device_data()

        self.accountant = make_accountant(opt) if opt.use_dp else None
        self.start_epoch = 0
        if opt.resume_path is not None and opt.resume_epochs > 0:
            gpath = os.path.join(opt.resume_path, "saves", f"G-{opt.resume_epochs}")
            dpath = os.path.join(opt.resume_path, "saves", f"D-{opt.resume_epochs}")
            self.state, _ = checkpoint.load_g(gpath, self.state)
            self.state, _, acc_state = checkpoint.load_d(dpath, self.state)
            # Resume epoch range = [resume_epochs, n_epochs) (train.py:577).
            self.start_epoch = opt.resume_epochs
            if acc_state and opt.use_dp:
                self.accountant = accountant_from_state_dict(acc_state)
            # Checkpoint loads replace leaves with host arrays; re-commit.
            self.state = self.mesh.put_state(self.state)

        # Fixed sampling grid (train.py:256-261).
        self.root_key = jax.random.PRNGKey(opt.manual_seed)
        k_fz, k_fy = jax.random.split(jax.random.fold_in(self.root_key, 0xF1CED))
        self.fixed_z = self.builder.gen_z(k_fz, opt.sample_num)
        if opt.conditional:
            reps = max(1, opt.sample_num // opt.n_classes)
            self.fixed_y = jnp.tile(jnp.arange(opt.n_classes, dtype=jnp.int32), reps)
            self.fixed_z = self.fixed_z[: len(self.fixed_y)]
        else:
            self.fixed_y = None

        self.logger = build_logger(
            opt, os.path.join(opt.output_dir, "log.csv"),
            write_header=opt.resume_path is None)
        self.privacy_log = None
        if opt.use_dp:
            self.privacy_log = open(os.path.join(opt.output_dir, "privacy_log.csv"), "a")
            self.privacy_writer = csv.writer(self.privacy_log)
            if opt.resume_path is None:
                self.privacy_writer.writerow(["Epoch", "Epsilon"])
                self.privacy_log.flush()

        self.batches_per_epoch = opt.train_set_size / opt.batch_size
        self._global_step = 0
        self._seg_runners = {}
        # Per-batch metric accumulation happens in ONE jitted combine per
        # step (the naive per-stat adds cost ~15 dispatches/step, which
        # dominates on high-dispatch-latency links).
        self._d_acc = None
        self._g_acc = None
        self._comb = jax.jit(lambda acc, m: jax.tree.map(jnp.add, acc, m))

        def comb_is(acc, m):
            out = {k: acc[k] + v for k, v in m.items()}
            out["is_sens_min"] = jnp.minimum(acc["is_sens_min"], m["is_sens"])
            out["is_sens_max"] = jnp.maximum(acc["is_sens_max"], m["is_sens"])
            return out

        self._comb_is = jax.jit(comb_is)

        # Scan-mode segment sums accumulate device-side in ONE jitted
        # combine per segment: on this relay every dispatch costs 1-20 ms,
        # and the previous per-stat `logger.stats[name] += ...` adds (~13
        # dispatches/segment) dominated the measured epoch time (the whole
        # 100-step MNIST epoch is 1.3 GFLOP / 1.74 GB — compute is ~2 ms).
        # The name mapping into logger.stats happens once per log flush.
        self._scan_acc = None
        # Zero accumulator templates (built lazily from the runner's output
        # structure via eval_shape): passed as acc_in on the first segment of
        # every flush interval so cross-segment accumulation happens inside
        # the runner dispatch itself, with a single jit specialization.
        # Keyed by use_dp like the runners themselves — the gc/is metric
        # dicts differ in structure, so a single cached template would be a
        # mismatched pytree if a scan epoch ever ran with the other use_dp.
        self._zero_accs = {}
        # Multi-epoch runners (one dispatch covering k whole epochs when the
        # logging interval spans epoch boundaries), keyed by (use_dp, k).
        self._epoch_runners = {}
        # g_mask cache: segment cut points repeat every epoch; re-uploading
        # the mask array is one more per-segment dispatch otherwise.
        self._g_masks = {}
        # Commit the carried rng (and the mean-sample dummy) so the segment
        # runner compiles once, not twice (uncommitted->committed args).
        self._seg_rng = self.mesh.put_replicated(
            jax.random.fold_in(self.root_key, 0x5E9))
        self._ms_dummy = self.mesh.put_replicated(jnp.zeros(()))
        # Per-epoch permutations are derived ON-DEVICE inside the segment
        # runner from (this key, epoch) — no per-epoch perm dispatch.
        self._perm_key = self.mesh.put_replicated(
            jax.random.fold_in(self.root_key, 0xE90C))
        # Profiling (-p): host-side section timers printed as a summary
        # table at the end (reference prints a key-averages table,
        # train.py:145-148), alongside the xplane trace.
        self._timer = None
        if opt_get(opt, "profile_training", False):
            from csl_gan_tpu.training.profiling import SectionTimer
            self._timer = SectionTimer()
        # train_d_until_threshold accumulator carried through the interval
        # scan (persists across segments and epochs, like the host path's
        # logger.d_adv_loss).
        self._thresh_acc = self.mesh.put_replicated(jnp.zeros(()))
        # True IS-sensitivity interval extremes in scan mode.
        self._is_min = None
        self._is_max = None
        # --stop_on_g_freeze: consecutive logging intervals with zero G
        # updates (checked in _flush_log; run() stops at the next epoch
        # group boundary and writes the normal final checkpoint).
        self._g_freeze_streak = 0
        self._g_freeze_stop = False
        # Exact Poisson subsampling (--poisson): per-step device-side draw.
        self._poisson_draw = None
        if self.builder.poisson:
            if self._dev_data is None:
                raise Exception(
                    "--poisson requires an in-memory (device-resident) "
                    "dataset; this dataset is streamed from the host.")
            self._poisson_draw = jax.jit(self.builder.poisson_draw)

    # ---------------- device-resident data ----------------

    def _setup_device_data(self):
        """Upload in-memory datasets (and mean samples) to the device once;
        per-step host->device traffic then reduces to tiny index vectors and
        RNG keys. This is both the TPU-idiomatic design (SURVEY.md §7.3:
        device-side prefetch) and essential on tunneled TPUs where bulk
        host->device copies cost ~30 MB/s."""
        import jax.numpy as jnp

        self._dev_data = None
        self._dev_public = None
        self._dev_mean = None
        self._dev_preprocess = None
        if isinstance(self.dataset, ArrayDataset) and \
                self.dataset.images.nbytes <= (4 << 30):
            imgs = np.asarray(self.dataset.images)  # resolves memmaps
            dtype = jnp.uint8 if imgs.dtype == np.uint8 else jnp.float32
            # Float32 image tables are stored FLAT [N, F]: gathering rows of
            # an [N,H,W,1] table runs at 1/128th lane utilization (measured
            # 420 us vs 38 us for a bs=600 MNIST batch — it was 66% of the
            # whole epoch scan). Rows are unflattened right after the gather
            # (steps.py unflatten_rows). uint8 tables (CelebA decode-once
            # cache) measured slightly FASTER in natural layout; kept as-is.
            img_shape = imgs.shape[1:]
            flatten = imgs.ndim > 2 and dtype == jnp.float32
            want_u8 = opt_get(self.opt, "u8_table", False)
            u8_ok = flatten and want_u8 and self.opt.n_classes <= 255
            if want_u8 and not u8_ok:
                # A requested-but-inapplicable --u8_table must be LOUD:
                # opt.txt records the flag, so a silent fallback would make
                # runs look uint8-stored when they were not.
                print("--u8_table requested but not applicable to this "
                      "dataset (needs a float image table and <=255 "
                      "classes); falling back to the default storage.")
            if u8_ok:
                # --u8_table: pixels stored x255 as uint8 with the label in
                # a trailing u8 column — half the gather bytes of
                # --bf16_table. gather_batch dequantizes u8/255 in fp32
                # (the loader's own math, data/mnist.py:128), so u8-derived
                # pixels round-trip to <= 1 ulp (XLA lowers the /255 as a
                # reciprocal multiply); anything else quantizes to 1/255
                # steps (announced below). No one-hot columns: the Pallas
                # megakernel consumes float rows and is auto-gated off via
                # onehot_in_table. The shared gather/perm setup below is
                # reused — only the table contents/dtype differ.
                flat = imgs.reshape(len(imgs), -1)
                p255 = flat * 255.0
                if not (np.all(p255 == np.rint(p255)) and p255.min() >= 0
                        and p255.max() <= 255):
                    print("Device image table stored uint8 (--u8_table): "
                          "pixels are NOT u8-exact; quantizing to 1/255 "
                          "steps (same order as source u8 quantization).")
                else:
                    print("Device image table stored uint8 (--u8_table), "
                          "<=1-ulp dequant u8/255 after the gather.")
                imgs = np.concatenate(
                    [np.rint(np.clip(p255, 0, 255)).astype(np.uint8),
                     np.asarray(self.dataset.labels,
                                np.uint8).reshape(-1, 1)], axis=1)
                dtype = jnp.uint8
                self.builder.img_shape = img_shape
                self.builder.labels_in_table = True
            elif flatten:
                imgs = imgs.reshape(len(imgs), -1)
                self.builder.img_shape = img_shape
                # Pack the label as a trailing f32 column: one row gather
                # then serves both x and y (steps.py gather_batch) — the
                # separate label gather cost 4.5 us/step on the launch-
                # bound MNIST scan, while the extra column rides in the
                # same padded lane tile (784 -> 896 either way). Labels
                # 0..n_classes-1 round-trip f32 exactly.
                cols = [imgs]
                if self.opt.conditional and 2 <= self.opt.n_classes <= 64:
                    # Also pack the label ONE-HOT between pixels and label:
                    # the whole-epoch Pallas runner (ops/pallas_epoch.py)
                    # then consumes gathered rows as ready-made
                    # [x || one-hot] ghost inputs with no 190 MB concat
                    # fusion per epoch (measured 0.65 ms/epoch); the
                    # columns pad into the same 896-lane gather tile.
                    eye = np.eye(self.opt.n_classes, dtype=np.float32)
                    cols.append(eye[np.asarray(self.dataset.labels,
                                               np.int64)])
                    self.builder.onehot_in_table = True
                cols.append(np.asarray(self.dataset.labels,
                                       np.float32).reshape(-1, 1))
                imgs = np.concatenate(cols, axis=1)
                self.builder.labels_in_table = True
                # --bf16_table: bf16 storage halves the gather bytes (the
                # biggest single op of the launch-bound MNIST epoch);
                # rows convert to f32 right after the gather
                # (steps.gather_batch / the megakernel's block load), so
                # training arithmetic is exact on the stored values.
                # One-hot and small-int label columns are bf16-exact.
                if opt_get(self.opt, "bf16_table", True):
                    dtype = jnp.bfloat16
                    # Announce the storage-dtype decision (ADVICE r4): runs
                    # compared against fp32-table logs can tell which mode
                    # produced them without reading opt.txt.
                    print("Device image table stored bfloat16 "
                          "(--bf16_table; rows convert to fp32 after the "
                          "gather, DP arithmetic exact on stored values).")
            self._dev_data = (
                self.mesh.put_replicated(jnp.asarray(imgs, dtype)),
                self.mesh.put_replicated(jnp.asarray(self.dataset.labels, jnp.int32)))
            self._gather = jax.jit(lambda im, lb, idx: (im[idx], lb[idx]))
            if self._uint8_images:
                def dev_preprocess(x, key):
                    x = x.astype(jnp.float32) / 127.5 - 1.0
                    flip = jax.random.bernoulli(key, 0.5, (x.shape[0],))
                    return jnp.where(flip[:, None, None, None],
                                     x[:, :, ::-1, :], x)
                self._dev_preprocess = dev_preprocess
            bs = self.opt.batch_size

            def gather_next(im, lb, perm, counter):
                idx = jax.lax.dynamic_slice(perm, (counter * bs,), (bs,))
                x, yy = self.builder.gather_batch(im, lb, idx)
                return x, yy, counter + 1

            # Counter lives on device and round-trips through the jit: a full
            # epoch runs with zero per-step host->device transfers.
            self._gather_next = jax.jit(gather_next)
            self._perm = jax.jit(
                lambda key: jax.random.permutation(key, len(self.dataset)))
        self._setup_aux_device_data()

    def _setup_aux_device_data(self):
        """Device-resident public split and mean samples (shared tail of
        _setup_device_data; also the u8-table early path's exit)."""
        import jax.numpy as jnp

        if isinstance(self.public_dataset, ArrayDataset) and \
                self.public_dataset.images.nbytes <= (1 << 30):
            self._dev_public = (
                self.mesh.put_replicated(
                    jnp.asarray(self.public_dataset.images, jnp.float32)),
                self.mesh.put_replicated(
                    jnp.asarray(self.public_dataset.labels, jnp.int32)))
        if self.mean_sampler is not None:
            self._dev_mean = self.mesh.put_replicated(
                jnp.asarray(self.mean_sampler.mean_samples, jnp.float32))
            self._dev_mean_sample = jax.jit(
                self.mean_sampler.device_sample_fn(), static_argnums=(3,))

    # ---------------- profiling helpers ----------------

    def _section(self, name: str):
        from contextlib import nullcontext
        return self._timer.section(name) if self._timer else nullcontext()

    def _force(self):
        """Force device execution (for honest section timings; device_get,
        not block_until_ready, which can return early on this backend)."""
        if self._timer:
            leaf = jax.tree_util.tree_leaves(self.state.d_params)[0]
            if self.mesh.state_sharded:
                # ZeRO-3 leaves may not be fully addressable (multihost);
                # fetching this process's own shard forces execution equally.
                jax.device_get(leaf.addressable_shards[0].data)
            else:
                jax.device_get(leaf)

    # ---------------- per-batch helpers ----------------

    def _step_key(self):
        self._global_step += 1
        return jax.random.fold_in(self.root_key, self._global_step)

    def _penalty_data(self, x, y):
        """Host-side get_penalty_data (train.py:186-202)."""
        opt = self.opt
        if not opt.penalty or not opt.penalty_use_public_data:
            return x, y
        b = x.shape[0]
        if opt.public_set_size > 0:
            if y is None:
                px, py = self.public_dataloader.one_batch()
                return px[:b], None
            data, labels = zip(*[self.public_dataset.get_item_with_label(int(l))
                                 for l in np.asarray(y)])
            return np.stack(data), np.asarray(labels, dtype=np.int64)
        if opt.num_mean_samples > 0:
            if self._dev_mean is not None:
                data, labels = self._dev_mean_sample(
                    self._dev_mean, self._step_key(),
                    None if y is None else jnp.asarray(y), b)
                return data, (labels if y is not None else None)
            data, labels = self.mean_sampler.sample(
                b, requested_labels=None if y is None else np.asarray(y))
            return data, (labels if y is not None else None)
        return x, y

    def _adaptive_data(self):
        """Public/mean batch for adaptive clipping (train.py:204-217)."""
        opt = self.opt
        if opt.public_set_size > 0:
            if self._dev_public is not None:
                idx = self.public_dataloader._epoch_indices()[: opt.batch_size]
                img, labels = self._gather(*self._dev_public, jnp.asarray(idx))
            else:
                img, labels = self.public_dataloader.one_batch()
            return img, (labels if opt.conditional else None)
        if self._dev_mean is not None:
            img, labels = self._dev_mean_sample(
                self._dev_mean, self._step_key(), None, opt.batch_size)
        else:
            img, labels = self.mean_sampler.sample(opt.batch_size)
        return img, (labels if opt.conditional else None)

    # ---------------- device-side interval scan ----------------

    def _scan_mode(self) -> bool:
        """Whole logging intervals run as one jitted lax.scan when the
        dataset is device-resident and all per-batch host decisions are
        static (no public-data paths). train_d_until_threshold gating is
        jit-safe (a lax.cond on the carried D-loss average inside the scan,
        steps.py build_segment_runner), so the flagship CelebA DP config
        (threshold forced to -1) takes this path too."""
        opt = self.opt
        return (self._dev_data is not None
                and opt.public_set_size == 0
                # DCResNet's scan-wrapped step takes minutes to compile on
                # the remote-compile backend, so scan requires enough total
                # steps to amortize; the Vanilla models compile in seconds.
                and (opt.model == "Vanilla"
                     or opt.n_epochs * len(self.dataloader) >= 1000)
                and not opt_get(opt, "host_loop", False))

    def _get_runner(self, use_dp: bool, grouped: bool = False):
        key = (use_dp, grouped)
        if key not in self._seg_runners:
            mean_fn = (self.mean_sampler.device_sample_fn()
                       if self._dev_mean is not None else None)
            self._seg_runners[key] = self.builder.build_segment_runner(
                use_dp, mean_fn, preprocess=self._dev_preprocess,
                batch_sharding=(self.mesh.batch if self.mesh.n_devices > 1
                                else None),
                # n_d_steps==1 makes every g_mask this Trainer builds
                # all-True; with threshold gating off too, the runner can
                # drop the per-step G lax.cond (TPU pipeline flush).
                assume_full_cadence=(
                    self.opt.n_d_steps <= 1
                    and float(self.opt.train_d_until_threshold) >= 1e10),
                # Cadence-grouped fresh-fake batching (--group_fakes):
                # every g_mask this Trainer builds IS the standard cadence
                # pattern (arange(start, cut) % n_d_steps == 0 below), so
                # the grouped runner's mask contract holds whenever the
                # segment start is itself a Python int (it is).
                grouped=grouped)
        return self._seg_runners[key]

    def _get_zero_acc(self, use_dp: bool, runner, args):
        if use_dp not in self._zero_accs:
            self._zero_accs[use_dp] = self._zero_scan_acc(runner, args)
        return self._zero_accs[use_dp]

    def _zero_scan_acc(self, runner, args):
        """Zero acc_in template from the runner's output structure
        (eval_shape: trace only, no compile/execute)."""
        out_s = jax.eval_shape(runner, *args)
        d_s, g_s, c_s = out_s[2], out_s[3], out_s[4]

        def init(k, s):
            # Extreme-tracked keys seed with +/-inf so a fresh interval's
            # first min/max wins. MUST stay in sync with the acc_in pop in
            # steps.py build_segment_runner (same key names) — a zeros
            # template there would silently log IS Min = 0.
            if k == "is_sens_min":
                return jnp.full(s.shape, jnp.inf, s.dtype)
            if k == "is_sens_max":
                return jnp.full(s.shape, -jnp.inf, s.dtype)
            return jnp.zeros(s.shape, s.dtype)

        return ({k: self.mesh.put_replicated(init(k, s))
                 for k, s in d_s.items()},
                jax.tree.map(lambda s: self.mesh.put_replicated(
                    jnp.zeros(s.shape, s.dtype)), g_s),
                self.mesh.put_replicated(jnp.zeros(c_s.shape, c_s.dtype)))

    def _accumulate_sums(self, d_sums, g_sums, g_count, seg_len):
        """Fold a segment's summed metrics into the logger stats."""
        s = self.logger.stats
        mapping = {"d_adv_loss": "D Adv Loss", "d_real_loss": "D Real Loss",
                   "d_fake_loss": "D Fake Loss", "d_real_acc": "D Real Acc",
                   "d_fake_acc": "D Fake Acc",
                   "d_real_aux_loss": "D Real Aux Loss",
                   "d_real_aux_acc": "D Real Aux Acc", "penalty": "D Penalty"}
        for k, name in mapping.items():
            if k in d_sums and name in s:
                s[name] += d_sums[k]
        if "norm_mean" in d_sums:
            s["D Layer Grad Norm Means"] += d_sums["norm_mean"][self._torch_idx]
            s["D Layer Grad Norm Stds"] += d_sums["norm_std"][self._torch_idx]
            s["D Layer Grad Norm Maxes"] += d_sums["norm_max"][self._torch_idx]
            c = d_sums["clipping"]
            s["Clipping Params"] += c[self._torch_idx] if c.ndim else c
            s["Grads Clipped"] += d_sums["frac_clipped"][self._torch_idx]
        if "is_sens" in d_sums:
            s["IS Mean"] += d_sums["is_sens"]
            # True extremes from the scan (steps.py segment runner); folded
            # into the logger at flush time (min/max don't accumulate by +).
            if "is_sens_min" in d_sums:
                self._is_min = d_sums["is_sens_min"] if self._is_min is None \
                    else jnp.minimum(self._is_min, d_sums["is_sens_min"])
                self._is_max = d_sums["is_sens_max"] if self._is_max is None \
                    else jnp.maximum(self._is_max, d_sums["is_sens_max"])
        gmap = {"g_adv_loss": "G Adv Loss", "g_aux_loss": "G Aux Loss",
                "g_aux_acc": "G Aux Acc"}
        for k, name in gmap.items():
            if k in g_sums and name in s:
                s[name] += g_sums[k]
        if g_count is not None:
            self.logger.log_g_iter = self.logger.log_g_iter + g_count

    def _epoch_scan(self, epoch: int):
        opt = self.opt
        n = len(self.dataloader)
        bs = opt.batch_size
        # Sample-count cadences apply only when NOT converted to epoch units
        # (options.py derive: log_every >= train_set_size becomes
        # log_every_epochs, handled once per epoch in run() — without this
        # gate the log_every == train_set_size corner flushed twice, the
        # second time logging an all-zero row).
        log_in_scan = opt.log_every_epochs < 0
        sample_in_scan = opt.sample_every_epochs < 0
        cuts = sorted({k for k in range(1, n + 1)
                       if k == n
                       or (log_in_scan and (k * bs) % opt.log_every == 0)
                       or (sample_in_scan and (k * bs) % opt.sample_every == 0)})
        grouped_ok = self.builder.grouped_runner_ok(opt.use_dp)
        ms = self._dev_mean if self._dev_mean is not None else self._ms_dummy
        start = 0
        for cut in cuts:
            seg = cut - start
            # Grouped (--group_fakes) when the segment starts on a cadence
            # boundary (its head/group decomposition is start-static);
            # other cuts fall back to the per-batch runner.
            runner = self._get_runner(
                opt.use_dp, grouped_ok and start % opt.n_d_steps == 0)
            if (start, cut) not in self._g_masks:
                self._g_masks[(start, cut)] = self.mesh.put_replicated(
                    jnp.asarray(np.arange(start, cut) % opt.n_d_steps == 0))
            g_mask = self._g_masks[(start, cut)]
            with self._section("interval_scan"):
                # ONE dispatch per segment: the runner derives the epoch's
                # permutation from (key, epoch) on-device and folds the
                # previous segments' metric sums in via acc_in.
                args = (self.state, self._seg_rng, *self._dev_data,
                        self._perm_key, start, g_mask, ms, self._thresh_acc)
                # Zero template from the UNGROUPED runner (same metric
                # structure; the grouped jit treats `start` statically,
                # which eval_shape cannot).
                zero_acc = self._get_zero_acc(
                    opt.use_dp, self._get_runner(opt.use_dp),
                    args + (None, epoch))
                acc_in = self._scan_acc if self._scan_acc is not None \
                    else zero_acc
                (self.state, self._seg_rng, d_sums, g_sums, g_count,
                 self._thresh_acc) = runner(*args, acc_in, epoch)
                self._force()
            self._scan_acc = (d_sums, g_sums, g_count)
            if opt.use_dp and self.accountant is not None:
                with self._section("accounting"):
                    self.accountant.step(seg)
            if log_in_scan and (cut * bs) % opt.log_every == 0:
                with self._section("log_flush"):
                    self._flush_log(epoch,
                                    100 * (cut - 1) / self.batches_per_epoch,
                                    print_dp=opt.use_dp)
            if sample_in_scan and (cut * bs) % opt.sample_every == 0:
                with self._section("sampling"):
                    self.sample(epoch, cut - 1)
            start = cut
        return n - 1  # last batch index

    # Cap on epochs per dispatch: bounds host-unresponsiveness per dispatch
    # and the compile-specialization variety while still amortizing the
    # ~1 ms dispatch-issue cost to ~10 us/epoch.
    MAX_EPOCH_GROUP = 100

    def _get_epochs_runner(self, use_dp: bool, k: int):
        key = (use_dp, k)
        if key not in self._epoch_runners:
            from csl_gan_tpu.ops import pallas_epoch
            if (opt_get(self.opt, "pallas_epoch", True)
                    and jax.default_backend() == "tpu"
                    and pallas_epoch.supports(self.builder, use_dp,
                                              self.mesh.n_devices)):
                # Whole-epoch Pallas megakernel (MNIST vanilla DP flagship):
                # params + Adam moments stay VMEM-resident across the
                # epoch's steps; same signature and metric structure as the
                # XLA epochs runner (ops/pallas_epoch.py).
                self._epoch_runners[key] = \
                    pallas_epoch.build_pallas_epochs_runner(
                        self.builder, k, len(self.dataloader), use_dp)
                return self._epoch_runners[key]
            mean_fn = (self.mean_sampler.device_sample_fn()
                       if self._dev_mean is not None else None)
            self._epoch_runners[key] = self.builder.build_epochs_runner(
                use_dp, k, len(self.dataloader), mean_fn,
                preprocess=self._dev_preprocess,
                batch_sharding=(self.mesh.batch if self.mesh.n_devices > 1
                                else None),
                assume_full_cadence=(
                    self.opt.n_d_steps <= 1
                    and float(self.opt.train_d_until_threshold) >= 1e10),
                # Epoch dispatches always start at batch 0 and use the
                # standard per-epoch cadence mask, so the grouped runner's
                # contract holds whenever the config is eligible.
                grouped=self.builder.grouped_runner_ok(use_dp))
        return self._epoch_runners[key]

    def _multi_epoch_scan(self, epoch0: int, k: int) -> int:
        """k whole epochs in ONE runner dispatch (no intra-epoch log/sample
        cuts — the caller guarantees no host event falls strictly inside the
        span). Bit-identical to k chained _epoch_scan calls
        (tests/test_segment_runner.py); the accountant is NOT stepped here —
        the caller steps it per epoch when writing privacy rows."""
        opt = self.opt
        n = len(self.dataloader)
        runner = self._get_epochs_runner(opt.use_dp, k)
        ms = self._dev_mean if self._dev_mean is not None else self._ms_dummy
        if (0, n) not in self._g_masks:
            self._g_masks[(0, n)] = self.mesh.put_replicated(
                jnp.asarray(np.arange(n) % opt.n_d_steps == 0))
        g_mask = self._g_masks[(0, n)]
        # Zero template comes from the single-epoch runner's output structure
        # (identical to the epochs runner's).
        seg_args = (self.state, self._seg_rng, *self._dev_data,
                    self._perm_key, 0, g_mask, ms, self._thresh_acc)
        zero_acc = self._get_zero_acc(opt.use_dp, self._get_runner(opt.use_dp),
                                      seg_args + (None, epoch0))
        acc_in = self._scan_acc if self._scan_acc is not None else zero_acc
        with self._section("interval_scan"):
            (self.state, self._seg_rng, d_sums, g_sums, g_count,
             self._thresh_acc) = runner(
                self.state, self._seg_rng, *self._dev_data, self._perm_key,
                g_mask, ms, self._thresh_acc, acc_in, epoch0)
            self._force()
        self._scan_acc = (d_sums, g_sums, g_count)
        return n - 1

    def _group_epochs(self, epoch: int) -> int:
        """How many epochs from `epoch` can run as one dispatch: extend while
        the would-be interior epoch has no host event (log/sample/save
        cadence, epsilon-budget stop — the budget stop is deterministic in
        the step count, so it is computed ahead instead of checked after)."""
        opt = self.opt
        n = len(self.dataloader)
        budget = opt.epsilon_budget if opt.use_dp else None
        base_steps = self.accountant.steps if self.accountant else 0

        def has_event(j: int) -> bool:
            if (j + 1) % opt.log_every_epochs == 0:
                return True
            if (j + 1) % opt.sample_every_epochs == 0:
                return True
            if (j + 1) % opt.save_every == 0:
                return True
            if budget is not None:
                saved = self.accountant.steps
                self.accountant.steps = base_steps + (j - epoch + 1) * n
                eps, _ = self.accountant.get_privacy_spent(opt.delta)
                self.accountant.steps = saved
                # Bare eps, matching run()'s break condition (reference
                # train.py:592 compares without the mean-sample cost).
                if eps > budget:
                    return True
            return False

        k = 1
        while (epoch + k < opt.n_epochs and k < self.MAX_EPOCH_GROUP
               and not has_event(epoch + k - 1)):
            k += 1
        return k

    def _d_step(self, x, y, use_dp: bool, valid=None):
        opt = self.opt
        pen_x, pen_y = (self._penalty_data(x, y) if opt.penalty else (x, y))
        rng = self._step_key()
        x = jnp.asarray(x)
        y = None if y is None else jnp.asarray(y)
        pen_x = jnp.asarray(pen_x)
        pen_y = None if pen_y is None else jnp.asarray(pen_y)
        if use_dp and self.builder.d_step_dp is not None:
            if opt.dp_mode == "gc":
                if self.builder.adaptive:
                    ax, ay = self._adaptive_data()
                    ax = jnp.asarray(ax)
                    ay = None if ay is None else jnp.asarray(ay)
                else:
                    ax, ay = x, y
                self.state, m = self.builder.d_step_dp(
                    self.state, x, y, pen_x, pen_y, ax, ay, rng, valid)
            else:
                self.state, m = self.builder.d_step_dp(
                    self.state, x, y, pen_x, pen_y, rng)
            if self.accountant is not None:
                self.accountant.step()
        else:
            self.state, m = self.builder.d_step_plain(
                self.state, x, y, pen_x, pen_y, rng)
        return m

    def _accumulate_d(self, m):
        if self.opt.train_d_until_threshold < 1e10:
            self.logger.d_adv_loss = self.logger.d_adv_loss + m["d_adv_loss"]
        if self._d_acc is None:
            acc = dict(m)
            if "is_sens" in m:
                acc["is_sens_min"] = m["is_sens"]
                acc["is_sens_max"] = m["is_sens"]
            self._d_acc = acc
        elif "is_sens" in m:
            self._d_acc = self._comb_is(self._d_acc, m)
        else:
            self._d_acc = self._comb(self._d_acc, m)

    def _accumulate_g(self, m):
        self._g_acc = m if self._g_acc is None else self._comb(self._g_acc, m)

    # ---------------- public surface ----------------

    def train_batch(self, epoch: int, batch_i: int, x, y, use_dp: bool,
                    valid=None):
        """One train() call (train.py:521-546)."""
        opt = self.opt
        y = y if opt.conditional else None
        with self._section("d_step"):
            m = self._d_step(x, y, use_dp, valid)
            self._force()
        self._accumulate_d(m)

        if batch_i % opt.n_d_steps == 0:
            train_g = True
            if opt.train_d_until_threshold < 1e10:
                d_avg = float(jax.device_get(self.logger.d_adv_loss)) / opt.n_d_steps
                train_g = d_avg < opt.train_d_until_threshold
            if train_g:
                self.logger.log_g_iter += 1
                with self._section("g_step"):
                    self.state, gm = self.builder.g_step(self.state,
                                                         self._step_key())
                    self._force()
                self._accumulate_g(gm)
            self.logger.d_adv_loss = 0.0

        if opt.log_every_epochs < 0 and \
                ((batch_i + 1) * opt.batch_size) % opt.log_every == 0:
            with self._section("log_flush"):
                self._flush_log(epoch, 100 * batch_i / self.batches_per_epoch,
                                print_dp=use_dp)
        if opt.sample_every_epochs < 0 and \
                ((batch_i + 1) * opt.batch_size) % opt.sample_every == 0:
            with self._section("sampling"):
                self.sample(epoch, batch_i)

    def _fold_acc(self):
        """Fold the per-batch accumulators into logger.stats (host-side)."""
        interval = self.logger.interval
        if self._scan_acc is not None:
            d_sums, g_sums, g_count = self._scan_acc
            self._accumulate_sums(d_sums, g_sums, g_count, 0)
            self._scan_acc = None
        if self._d_acc is not None:
            acc = {k: v for k, v in self._d_acc.items()
                   if k not in ("is_sens_min", "is_sens_max")}
            self._accumulate_sums(acc, self._g_acc or {}, None, 0)
            if "is_sens_min" in self._d_acc:
                # Reference displays interval extremes; pre-scale by interval
                # so Logger.average() divides back to the raw value
                # (train.py:331-338 semantics).
                s = self.logger.stats
                s["IS Min"] = np.asarray(
                    jax.device_get(self._d_acc["is_sens_min"])) * interval
                s["IS Max"] = np.asarray(
                    jax.device_get(self._d_acc["is_sens_max"])) * interval
        if self._is_min is not None:  # scan-mode IS extremes
            s = self.logger.stats
            s["IS Min"] = np.asarray(jax.device_get(self._is_min)) * interval
            s["IS Max"] = np.asarray(jax.device_get(self._is_max)) * interval
            self._is_min = None
            self._is_max = None
        self._d_acc = None
        self._g_acc = None

    def _flush_log(self, epoch, epoch_progress, print_dp=False):
        self._fold_acc()
        # Rescale G stats by actual G train frequency (train.py:540-543).
        for stat in [k for k in self.logger.stats if k.startswith("G ")]:
            scale = 0 if self.logger.log_g_iter == 0 else \
                self.logger.interval / self.logger.log_g_iter
            self.logger.stats[stat] = np.asarray(
                jax.device_get(self.logger.stats[stat])) * scale
        n_freeze = opt_get(self.opt, "stop_on_g_freeze", 0) or 0
        if n_freeze > 0:
            if int(self.logger.log_g_iter) == 0:
                self._g_freeze_streak += 1
                if self._g_freeze_streak >= n_freeze \
                        and not self._g_freeze_stop:
                    self._g_freeze_stop = True
                    print(f"G frozen for {self._g_freeze_streak} consecutive "
                          "logging intervals (zero G updates; "
                          "train_d_until_threshold gating) — stopping after "
                          "this epoch group (--stop_on_g_freeze "
                          f"{n_freeze}).", flush=True)
            else:
                self._g_freeze_streak = 0
        self.logger.log_g_iter = 0
        # Pull remaining device stats once.
        for k, v in self.logger.stats.items():
            self.logger.stats[k] = np.asarray(jax.device_get(v))
        self.logger.log(epoch, epoch_progress)
        if print_dp and self.accountant is not None and self.accountant.steps > 0:
            eps, best_alpha = self.accountant.get_privacy_spent(self.opt.delta)
            print("({}, {})-DP for alpha={}".format(eps, self.opt.delta, best_alpha))

    def sample(self, epoch: int, batch: int):
        imgs = np.asarray(jax.device_get(
            self.builder.sample_images(self.state, self.fixed_z, self.fixed_y)))
        if self.opt.dataset == "CelebA":
            imgs = denorm_celeba(imgs)
        path = os.path.join(self.opt.output_dir, "samples",
                            f"{epoch + 1}-{batch}.png")
        save_image_grid(imgs, path, nrow=self.opt.n_classes)

    def warmup(self):
        """Non-private warmup on public/mean data (train.py:566-574)."""
        opt = self.opt
        for it in range(opt_get(opt, "warmup_iter", 0) or 0):
            if opt.public_set_size > 0:
                img, labels = self.public_dataloader.one_batch()
            elif self._dev_mean is not None:
                img, labels = self._dev_mean_sample(
                    self._dev_mean, self._step_key(), None, opt.batch_size)
            else:
                img, labels = self.mean_sampler.sample(opt.batch_size)
            self.train_batch(-1, it, img, labels, use_dp=False)
        if (opt_get(opt, "warmup_iter", 0) or 0) > 0:
            self.state = self.builder.reset_optimizers(self.state)

    def run(self) -> int:
        """Full training (train.py:553-603). Returns the last epoch index.

        Preemption-safe: SIGTERM (the signal batch schedulers send before a
        kill) requests a graceful stop — the current epoch group finishes,
        a full checkpoint (params, optimizer, accountant, clipping state)
        is written through the normal exit path, and the process exits 0;
        `--resume_path` continues from it with correct cumulative epsilon.
        The reference has no equivalent (a preempted run loses the
        accountant entirely — reference train.py keeps it in memory only).
        Under --multihost the scheduler must deliver the signal to every
        process (the usual SLURM/k8s behavior); a single-process signal
        would desynchronize the collective in _save.
        """
        opt = self.opt
        print("\nStarting training...\n")
        self.logger.reset_stats()
        self.warmup()

        self._preempted = threading.Event()
        prev_handler = None
        if threading.current_thread() is threading.main_thread():
            def _on_sigterm(signum, frame):
                print("SIGTERM: finishing the current epoch group, then "
                      "checkpointing and exiting.", flush=True)
                self._preempted.set()
            prev_handler = signal.signal(signal.SIGTERM, _on_sigterm)

        profile_ctx = None
        if opt_get(opt, "profile_training", False):
            profile_dir = os.path.join(opt.output_dir, "profile")
            jax.profiler.start_trace(profile_dir)
            profile_ctx = profile_dir

        epoch = self.start_epoch
        # Epoch grouping: when the scan path is active and no log/sample
        # cadence falls inside an epoch, one runner dispatch can span every
        # epoch up to the next host event (log/sample/save/budget-stop) —
        # the last ~1 ms/epoch of dispatch-issue cost on relay links.
        group_ok = (self._scan_mode() and opt.log_every_epochs > 0
                    and opt.sample_every_epochs > 0)
        try:
            # `next_e` is the iteration cursor; `epoch` tracks the LAST
            # completed epoch (the for-loop semantics of the single-epoch
            # path — the final save below labels from it).
            next_e = self.start_epoch
            while next_e < opt.n_epochs:
                epoch = next_e
                self.logger.reset_stats()
                batch_i = 0
                k = self._group_epochs(epoch) if group_ok else 1
                if k > 1:
                    batch_i = self._multi_epoch_scan(epoch, k)
                elif self._scan_mode():
                    batch_i = self._epoch_scan(epoch)
                elif self._dev_data is not None:
                    perm = self._perm(jax.random.fold_in(self.root_key,
                                                         0xE90C + epoch))
                    counter = jnp.zeros((), jnp.int32)
                    for batch_i in range(len(self.dataloader)):
                        valid = None
                        if self._poisson_draw is not None and opt.use_dp:
                            x, y, valid = self._poisson_draw(
                                *self._dev_data, self._step_key())
                        else:
                            x, y, counter = self._gather_next(*self._dev_data,
                                                              perm, counter)
                        if self._dev_preprocess is not None:
                            x = self._dev_preprocess(x, self._step_key())
                        self.train_batch(epoch, batch_i, x, y,
                                         use_dp=opt.use_dp, valid=valid)
                else:
                    for batch_i, (x, y) in enumerate(self.dataloader):
                        self.train_batch(epoch, batch_i, x, y, use_dp=opt.use_dp)

                # Per-epoch host bookkeeping for every epoch the dispatch
                # covered. By _group_epochs construction, log/sample/save
                # events can only fall on the group's LAST epoch; privacy
                # rows (host accountant math) are written for every epoch.
                stop = False
                for e in range(next_e, next_e + k):
                    if k > 1 and self.accountant is not None:
                        # The single-epoch paths step the accountant inside
                        # _epoch_scan/_d_step; the grouped dispatch does not.
                        self.accountant.step(len(self.dataloader))
                    if opt.log_every_epochs > 0 and (e + 1) % opt.log_every_epochs == 0:
                        self._flush_log(e, 100)
                    if opt.sample_every_epochs > 0 and \
                            (e + 1) % opt.sample_every_epochs == 0:
                        self.sample(e, batch_i)

                    eps = None
                    if opt.use_dp:
                        eps, _ = self.accountant.get_privacy_spent(opt.delta)
                        self.privacy_writer.writerow(
                            [e, eps + self.mean_sample_privacy_cost])
                        self.privacy_log.flush()

                    if opt.use_dp and opt.epsilon_budget is not None and \
                            eps > opt.epsilon_budget:
                        stop = True
                    if self._g_freeze_stop:
                        stop = True

                    if (e + 1) % opt.save_every == 0:
                        with self._section("checkpoint"):
                            self._save(e + 1, e)
                    epoch = e
                    if stop:
                        break
                if self._preempted.is_set():
                    print(f"Preempted after epoch {epoch}; saving and "
                          f"exiting (resume with --resume_path).",
                          flush=True)
                    stop = True
                if stop:
                    break
                next_e = epoch + 1
        finally:
            if prev_handler is not None:
                signal.signal(signal.SIGTERM, prev_handler)
            if profile_ctx is not None:
                jax.profiler.stop_trace()
                print("Profile trace written to", profile_ctx)
            if self._timer is not None:
                # Reference parity: a key-averages style summary table is
                # printed when profiling (reference train.py:145-148).
                print(self._timer.summary())

        print("Finished training.")
        self._save(epoch + 1, opt.n_epochs)
        self.logger.close()
        if self.privacy_log is not None:
            self.privacy_log.close()
        return epoch

    def _save(self, epoch_label: int, epoch: int):
        acc_state = self.accountant.state_dict() if self.accountant else None
        state = self.state
        if self.mesh.state_sharded and self.mesh.multihost:
            # ZeRO-3 leaves are sharded across processes; gather to a
            # replicated copy first (a collective — every process reaches
            # _save at the same step, so all participate).
            state = jax.jit(lambda s: s,
                            out_shardings=self.mesh.replicated)(state)
        checkpoint.save_pair(self.opt.output_dir, epoch_label, epoch,
                             state, acc_state)


def run_training(opt) -> Trainer:
    trainer = Trainer(opt)
    trainer.run()
    return trainer
