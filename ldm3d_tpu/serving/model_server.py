"""Model server core: load checkpoints, generate volumes, report status.

Contract parity with the reference's ``ModelServer``
(``mlops/docker/api_server.py:89-238``): ``load_model()`` with a dummy-model
fallback when no checkpoint exists (:138-155, used for serving/monitoring
infra tests), ``generate(num_samples, seed, ...)`` returning min-max
normalized volumes as base64 float32 with shape metadata, plus
``model_info()``.

Unlike the reference — whose server never wires in the real two-stage LDM
(SURVEY.md 3.4) — ``load_model`` here builds the actual pipeline from the
training config + orbax checkpoints and samples through the compiled
DDIM/DDPM scan.
"""

from __future__ import annotations

import base64
import contextlib
import logging
import threading
import time
from typing import Any, Optional

import numpy as np

log = logging.getLogger("model_server")


class _RWGate:
    """Reader-writer gate: ``generate()`` calls are readers, ``load_model()``
    (the ``POST /model/reload`` admin op) is the writer.

    Without it a reload swaps ``_run`` / ``_batcher`` / ``_sampler_cache``
    while an in-flight request is mid-``generate`` — the request can mix old
    weights with a new compiled program, or submit to a batcher that is being
    closed under it. Writer-preferring: once a reload is waiting, new requests
    queue behind it so a steady request stream cannot starve the reload
    (requests block for the reload's checkpoint-restore + compile; that is the
    correct contract for an admin op — the readiness probe covers clients)."""

    def __init__(self):
        self._cond = threading.Condition()
        self._readers = 0
        self._writer = False
        self._writers_waiting = 0

    @contextlib.contextmanager
    def read(self):
        with self._cond:
            while self._writer or self._writers_waiting:
                self._cond.wait()
            self._readers += 1
        try:
            yield
        finally:
            with self._cond:
                self._readers -= 1
                if self._readers == 0:
                    self._cond.notify_all()

    @contextlib.contextmanager
    def write(self):
        with self._cond:
            self._writers_waiting += 1
            while self._writer or self._readers:
                self._cond.wait()
            self._writers_waiting -= 1
            self._writer = True
        try:
            yield
        finally:
            with self._cond:
                self._writer = False
                self._cond.notify_all()


def _squeeze_single_channel(arr: np.ndarray) -> np.ndarray:
    """Drop a trailing size-1 channel axis; keep multi-channel volumes whole.

    The flagship configs decode to 1 channel, where clients expect bare
    (D, H, W) volumes; 2-channel variants (reference ``config_train_16g``)
    must not silently lose channel 1 — the response's ``shape`` metadata
    tells the client what it got."""
    return arr[..., 0] if arr.shape[-1] == 1 else arr


class _SamplerCacheEntry:
    """Cache slot for one compiled sampler variant.

    ``fn is None`` while (or after a failed) compile; ``ready`` is set once
    the owning thread published ``fn`` or recorded ``error``."""

    __slots__ = ("fn", "error", "ready")

    def __init__(self):
        self.fn = None
        self.error: Optional[BaseException] = None
        self.ready = threading.Event()


class ModelServer:
    def __init__(self, config_file: Optional[str] = None, environment_file: Optional[str] = None,
                 sampler: str = "ddim", steps: Optional[int] = None, batch: int = 1,
                 spatial: int = 1, decode_chunk: "int | str" = 0,
                 timestep_spacing: Optional[str] = None):
        """``batch``: volumes per compiled sampler call. Larger batches raise
        MXU utilization sharply (measured on v5e at 96^3: ~2.2x volumes/sec
        from batch 1-2 to batch 8); requests for more than ``batch`` samples
        run in chunks, shorter requests pad and trim.

        ``spatial``: shard each volume's depth over this many chips
        (halo-exchange convs / psum norms / gathered-kv attention,
        docs/SCALING.md) — serves volumes larger than one chip's memory.
        Requires ``batch * spatial`` visible devices."""
        self.config_file = config_file
        self.environment_file = environment_file
        self.sampler = sampler
        # None = sampler default (50 for ddim/dpm, full schedule for ddpm);
        # resolved to a concrete count at load_model time
        self.steps = steps
        from ldm3d_tpu.cli.common import TIMESTEP_SPACINGS

        if timestep_spacing is not None and timestep_spacing not in TIMESTEP_SPACINGS:
            raise ValueError(f"timestep_spacing must be one of "
                             f"{'|'.join(TIMESTEP_SPACINGS)}, got {timestep_spacing!r}")
        if timestep_spacing == "karras" and sampler == "ddpm":
            # statically invalid: fail at construction, not as a dummy-model
            # fallback at load time
            raise ValueError("karras timestep_spacing is not available on the "
                             "ancestral ddpm sampler; use ddim, dpm, or dpm3")
        # server-default grid spacing (None = the config's NoiseScheduler
        # value); per-request overrides compile separate cached variants
        self.timestep_spacing = timestep_spacing
        self._cond_shape = None
        self.batch = max(1, int(batch))
        self.spatial = max(1, int(spatial))
        # decode the sampled batch in chunks of this many volumes (0 = whole
        # batch; 'auto' probes the device->host rate at load and picks the
        # regime — whole batch on fast links, chunk 1 on slow ones where the
        # per-chunk readback overlap dominates; docs/PERFORMANCE.md)
        if isinstance(decode_chunk, str) and decode_chunk != "auto":
            raise ValueError(f"decode_chunk must be an int or 'auto', "
                             f"got {decode_chunk!r}")
        self.decode_chunk = (decode_chunk if decode_chunk == "auto"
                             else max(0, int(decode_chunk)))
        self.model_loaded = False
        self.is_dummy = False
        self.load_time: Optional[float] = None
        self.patch_size = [32, 32, 32]
        self._lock = threading.Lock()
        # serializes compiled sampler calls: concurrent batch-B programs can
        # co-resident-OOM the chip at production sizing (docs/PERFORMANCE.md)
        self._device_lock = threading.Lock()
        self._run = None  # compiled sampler fn for the server defaults
        self._batcher = None  # dynamic micro-batcher (serving/batcher.py)
        self._latent_shape = None
        self._encode_condition = None
        self._rng_counter = 0
        # per-request (sampler, steps, guidance, spacing) -> compiled run fn.
        # Bounded: each entry is an XLA program; evict the oldest non-default
        # entry so a step-count scan from a client can't accumulate programs
        # in HBM.
        self._sampler_cache: "dict[tuple, Any]" = {}
        self._sampler_cache_max = 8
        self._build_run = None  # (sampler, steps, guidance, spacing) -> run fn
        # reload vs in-flight generate: see _RWGate
        self._reload_gate = _RWGate()

    # -- loading -------------------------------------------------------------

    def load_model(self) -> None:
        # exclusive vs in-flight generate(): the swap of _run / _batcher /
        # _sampler_cache must never happen under a request — a half-swapped
        # pipeline could pair old weights with a new compiled program or
        # submit to a batcher being closed (see _RWGate)
        with self._reload_gate.write():
            t0 = time.time()
            if self._batcher is not None:  # reload: retire the old batcher
                self._batcher.close()
                self._batcher = None
            try:
                self._load_real()
                self.is_dummy = False
                log.info("loaded real two-stage LDM pipeline")
            except ValueError:
                # user-config errors (schema violations, invalid sampler/
                # spacing/step combinations) must fail LOUDLY: a server that
                # silently degrades to the dummy model reports healthy and
                # serves random noise with status 'success' (found in review).
                # The dummy fallback is for missing artifacts — the
                # reference's infra-test affordance (api_server.py:138-155) —
                # not for misconfiguration.
                raise
            except Exception as e:
                log.warning("falling back to dummy model: %s", e)
                self._load_dummy()
                self.is_dummy = True
            self.model_loaded = True
            self.load_time = time.time() - t0

    def _load_real(self) -> None:
        import argparse

        import jax
        import jax.numpy as jnp

        from ldm3d_tpu.ckpt import CheckpointManager, StageArtifacts
        from ldm3d_tpu.configs import define_instance
        from ldm3d_tpu.diffusion import inferer
        from ldm3d_tpu.utils import merge_configs_onto_args
        from ldm3d_tpu.utils.config_merge import TrainContext

        if not (self.config_file and self.environment_file):
            raise FileNotFoundError("no config/environment file configured")
        args = argparse.Namespace()
        merge_configs_onto_args(args, self.environment_file, self.config_file)
        ctx = TrainContext(args)
        self.patch_size = args.diffusion_train["patch_size"]
        if self.decode_chunk == "auto":
            # resolve against the real backend the server will decode on
            from ldm3d_tpu.cli.common import resolve_decode_chunk

            self.decode_chunk = resolve_decode_chunk("auto", log)
        rng = jax.random.PRNGKey(0)

        ae = define_instance(args, "autoencoder_def")
        g_vars = jax.jit(ae.init)({"params": rng, "sample": rng},
                         jnp.zeros((1, *self.patch_size, args.image_channels)))
        ae_params = CheckpointManager(args.model_dir, StageArtifacts.AUTOENCODER).restore_params(
            "best", g_vars["params"])
        unet = define_instance(args, "diffusion_def")
        latent = [p // ae.downsample_factor for p in self.patch_size]
        u_vars = jax.jit(unet.init)(rng, jnp.zeros((1, *latent, unet.in_channels)), jnp.zeros((1,), jnp.int32))
        u_ckpt = CheckpointManager(args.model_dir, StageArtifacts.DIFFUSION)
        u_params = u_ckpt.restore_params("best", u_vars["params"])
        scale_factor = float(u_ckpt.load_meta("best").get("scale_factor", 1.0))

        # same construction path as the inference/evaluate CLIs: ddpm
        # (full-loop parity) / ddim / dpm (DPM-Solver++ 2M)
        from ldm3d_tpu.cli.common import default_sampler_steps, make_sampling_scheduler

        conditional = unet.in_channels > ae.latent_channels
        self._latent_shape = (*latent, ae.latent_channels)
        cond_ch = unet.in_channels - ae.latent_channels
        sched_cfg = ctx.scheduler_config()
        self._sched_cfg = sched_cfg  # per-request sampler overrides need it
        distilled_sched = None
        if self.sampler == "distilled":
            # serve the progressively-distilled student (cli.distill): its
            # weights + few-step GridDDIM schedule from the 'distilled' role
            # (cli.common.load_distilled owns the checkpoint-meta contract)
            from ldm3d_tpu.cli.common import load_distilled

            try:
                u_params, distilled_sched, dmeta = load_distilled(
                    args.model_dir, u_vars["params"], sched_cfg)
            except FileNotFoundError as e:
                # a distilled server with no distilled checkpoint is a user-
                # actionable misconfiguration, not a generic missing-artifact
                # case: ValueError rides load_model's loud-failure re-raise
                # instead of degrading to the dummy model (ADVICE r2)
                raise ValueError(
                    f"sampler='distilled' but no distilled checkpoint in "
                    f"{args.model_dir!r}: run ldm3d-distill first ({e})") from e
            scale_factor = float(dmeta.get("scale_factor", scale_factor))
            if self.steps is not None and int(self.steps) != int(dmeta["num_steps"]):
                # consistent with the per-request path: the student's weights
                # and few-step grid are a unit — reject an explicit mismatched
                # --steps instead of silently replacing it (ADVICE r2)
                raise ValueError(
                    f"the distilled student has a fixed {int(dmeta['num_steps'])}"
                    f"-step grid; --steps {self.steps} cannot apply to it")
            self.steps = int(dmeta["num_steps"])
            log.info("serving distilled student: %d-step grid %s",
                     self.steps, dmeta["timesteps"])
        if self.steps is None:
            self.steps = default_sampler_steps(self.sampler, sched_cfg)

        @jax.jit
        def encode_fn(params, x, rng_key):
            return ae.apply({"params": params}, x, method="encode_stage_2_inputs",
                            rngs={"sample": rng_key})

        if self.spatial > 1:
            # depth-sharded sampling: each volume spread over `spatial` chips
            from ldm3d_tpu.parallel import (MeshSpec, create_mesh, make_spatial_sampler,
                                            validate_spatial_divisibility)

            devices = jax.devices()
            need = self.batch * self.spatial
            if len(devices) < need:
                raise RuntimeError(f"--spatial {self.spatial} x --batch {self.batch} "
                                   f"needs {need} devices, have {len(devices)}")
            mesh = create_mesh(MeshSpec(data=self.batch, spatial=self.spatial),
                               devices=devices[:need])
            n_levels = len(getattr(unet, "channels", [1, 1, 1]))
            validate_spatial_divisibility(latent[0], self.spatial, n_levels - 1)
            if self.decode_chunk:
                log.info("--decode-chunk ignored with --spatial: the depth-"
                         "sharded sampler decodes whole slabs per chip")
            # condition volumes must encode depth-sharded too: the default
            # (unsharded) encode_fn would OOM at the sizes --spatial serves
            from ldm3d_tpu.parallel import make_spatial_encoder

            encode_fn_sp = make_spatial_encoder(ae, mesh)

            def encode_fn(params, x, rng_key):  # noqa: F811 — spatial override
                b = x.shape[0]
                if b % self.batch:  # cover the data axis (e.g. batch-1 condition)
                    reps = (self.batch + b - 1) // b
                    x = jnp.tile(x, (reps,) + (1,) * (x.ndim - 1))[:self.batch]
                    return encode_fn_sp(params, x, rng_key)[:b]
                return encode_fn_sp(params, x, rng_key)

            def build_run(sampler_name: str, steps: int, guidance: float,
                          spacing: "str | None" = None):
                # None = server default (--timestep-spacing, else the config)
                spacing = spacing if spacing is not None else self.timestep_spacing
                scheduler = (distilled_sched if sampler_name == "distilled"
                             else make_sampling_scheduler(sampler_name, steps, sched_cfg,
                                                          timestep_spacing=spacing))
                sampler = make_spatial_sampler(unet, ae, scheduler, mesh,
                                               scale_factor=scale_factor,
                                               guidance_scale=guidance)

                def run(noise, rng_key, condition):
                    # list contract: run() returns un-materialized device
                    # arrays; the caller reads them back outside _device_lock
                    return [sampler(u_params, ae_params, noise, rng_key, condition)]

                return run
        else:
            # decode is sampler-independent: one compiled program shared by
            # every (sampler, steps, guidance) variant
            @jax.jit
            def decode_fn(params, z):
                return ae.apply({"params": params}, z / jnp.asarray(scale_factor, z.dtype),
                                method="decode_stage_2_outputs")

            # data-parallel serving: shard the sample batch over every chip
            # (GSPMD propagates; each chip samples batch/n volumes). Identity
            # when not applicable — multihost, indivisible batch, one device.
            from ldm3d_tpu.parallel import dp_sample_placer

            place, n_shards = dp_sample_placer(self.batch)
            if n_shards > 1:
                log.info("data-parallel sampling: batch %d sharded over %d chips",
                         self.batch, n_shards)

            def build_run(sampler_name: str, steps: int, guidance: float,
                          spacing: "str | None" = None):
                # None = server default (--timestep-spacing, else the config)
                spacing = spacing if spacing is not None else self.timestep_spacing
                scheduler = (distilled_sched if sampler_name == "distilled"
                             else make_sampling_scheduler(sampler_name, steps, sched_cfg,
                                                          timestep_spacing=spacing))

                # scan as its own compiled program, params as explicit jit
                # args (closing over weights would inline them as constants)
                @jax.jit
                def scan_fn(params, noise, rng_key, condition):
                    def unet_apply(z, t):
                        return unet.apply({"params": params}, z, t)
                    return inferer.sample_latents(unet_apply, scheduler, noise, rng_key,
                                                  condition=condition if conditional else None,
                                                  guidance_scale=guidance)

                chunk = self.decode_chunk if n_shards == 1 else 0

                def run(noise, rng_key, condition):
                    # list contract: every program is ENQUEUED here (scan +
                    # decode chunks) but nothing is materialized — the caller
                    # reads the device arrays back outside _device_lock, so
                    # host transfer overlaps the next request's compute
                    noise = place(noise)
                    if condition is not None:
                        condition = place(condition)
                    lat = scan_fn(u_params, noise, rng_key, condition)
                    if chunk and self.batch > chunk:
                        return [decode_fn(ae_params, lat[s:s + chunk])
                                for s in range(0, self.batch, chunk)]
                    return [decode_fn(ae_params, lat)]

                return run

        def encode_condition(vol, rng_key):
            return encode_fn(ae_params, vol, rng_key)

        self._cond_shape = (*latent, cond_ch) if conditional else None
        self._encode_condition = encode_condition
        self._build_run = build_run
        self._sampler_cache = {}
        self._run = self._get_run(self.sampler, self.steps, 1.0, None)

        # micro-batcher: merges concurrent single-volume requests into one
        # compiled batch-B call (serving/batcher.py). Only for deterministic
        # samplers (ddim/dpm): a sample's value then depends only on its own
        # noise, so seed-reproducibility survives arbitrary batch composition.
        # ddpm draws ancestral noise from the batch's rng, which would make a
        # request's output depend on its batch-mates — so ddpm skips batching.
        if self.batch > 1 and self.sampler != "ddpm":
            from ldm3d_tpu.serving.batcher import DynamicBatcher

            default_run = self._run  # the server-default compiled program

            def run_batched(noise_np, rng_seed, cond_np):
                key = jax.random.PRNGKey(int(rng_seed))
                noise = jnp.asarray(noise_np)
                cond = jnp.asarray(cond_np) if cond_np is not None else None
                with self._device_lock:  # enqueue only; read back lock-free
                    pending = default_run(noise, key, cond)
                return np.concatenate([np.asarray(p) for p in pending])

            self._batcher = DynamicBatcher(run_batched, self.batch, max_wait_ms=10.0)

    def _get_run(self, sampler_name: str, steps: int, guidance: float,
                 spacing: "str | None" = None):
        """Compiled sampler for a (sampler, steps, guidance, spacing) combination.

        Per-request options (reference ``GenerationRequest.inference_steps``
        / ``guidance_scale``, ``mlops/docker/api_server.py:53-54``) would
        recompile the scan per distinct value; the cache keeps the
        ``_sampler_cache_max`` least-recently-used programs (server-default
        config pinned) so repeated requests hit compiled code.

        Compilation happens OUTSIDE the cache lock: a variant compile takes
        seconds to minutes, and holding the lock for it would stall every
        concurrent request — including ones whose program is already cached.
        A placeholder entry with an event makes duplicate requests for the
        same new variant wait on the one in-flight compile instead of
        compiling twice."""
        key = (sampler_name, int(steps), float(guidance), spacing)
        default_key = (self.sampler, self.steps, 1.0, None)
        with self._lock:
            entry = self._sampler_cache.get(key)
            if entry is not None and entry.fn is not None:
                # move-to-end: the insertion-ordered dict doubles as LRU order
                self._sampler_cache.pop(key)
                self._sampler_cache[key] = entry
                return entry.fn
            owner = entry is None
            if owner:
                entry = _SamplerCacheEntry()
                self._sampler_cache[key] = entry
                self._evict_locked(default_key)
        if not owner:
            entry.ready.wait()
            if entry.fn is None:
                raise RuntimeError(
                    f"sampler variant {key} failed to compile") from entry.error
            return entry.fn
        log.info("compiling sampler variant %s", key)
        try:
            fn = self._build_run(sampler_name, steps, guidance, spacing)
        except BaseException as e:
            with self._lock:
                self._sampler_cache.pop(key, None)
            entry.error = e
            entry.ready.set()
            raise
        with self._lock:
            entry.fn = fn
            # re-enforce the bound: if every other entry was an in-flight
            # placeholder at insert time, eviction was deferred until a
            # completed entry exists — i.e. now
            self._evict_locked(default_key)
        entry.ready.set()
        return fn

    def _evict_locked(self, default_key: tuple) -> None:
        """Evict LRU *completed* non-default entries until the cache fits.
        In-flight placeholders are never evicted (their compiler thread will
        publish into them), so the bound can be exceeded transiently while
        more than ``_sampler_cache_max`` compiles are in flight; every
        publish re-runs this, restoring the bound at steady state."""
        while len(self._sampler_cache) > self._sampler_cache_max:
            victim = next((k for k, e in self._sampler_cache.items()
                           if k != default_key and e.fn is not None), None)
            if victim is None:
                return
            del self._sampler_cache[victim]

    def _load_dummy(self) -> None:
        if self.steps is None:
            self.steps = 50
        self._cond_shape = None
        self._latent_shape = None
        self._run = None
        self._build_run = None
        self._sampler_cache = {}
        self._encode_condition = None

    # -- generation -------------------------------------------------------------

    def generate(self, num_samples: int = 1, seed: Optional[int] = None,
                 condition_volume: Optional[np.ndarray] = None,
                 inference_steps: Optional[int] = None,
                 guidance_scale: Optional[float] = None,
                 output_format: str = "base64",
                 sampler: Optional[str] = None,
                 timestep_spacing: Optional[str] = None) -> dict[str, Any]:
        # shared read slot: a concurrent /model/reload waits for this request
        # to finish, and this request never sees a half-swapped pipeline
        with self._reload_gate.read():
            return self._generate(num_samples, seed, condition_volume,
                                  inference_steps, guidance_scale, output_format,
                                  sampler, timestep_spacing)

    def _generate(self, num_samples: int = 1, seed: Optional[int] = None,
                  condition_volume: Optional[np.ndarray] = None,
                  inference_steps: Optional[int] = None,
                  guidance_scale: Optional[float] = None,
                  output_format: str = "base64",
                  sampler: Optional[str] = None,
                  timestep_spacing: Optional[str] = None) -> dict[str, Any]:
        """Sample ``num_samples`` volumes.

        For concat-conditional models (in_channels > latent_channels), pass
        ``condition_volume`` — the low-count input volume, shape
        ``patch_size`` (or ``(*patch_size, C)``), intensity-scaled to [0,1].
        It is VAE-encoded once and conditions every sample. Without one,
        conditioning latents are drawn from N(0,1) — only useful for smoke
        tests, and flagged as ``"conditioning": "random"`` in the response.

        ``inference_steps`` / ``guidance_scale`` / ``sampler`` /
        ``timestep_spacing`` override the server defaults per request (the
        first two are the reference request schema,
        ``mlops/docker/api_server.py:51-56``; ``sampler`` and
        ``timestep_spacing`` — ``leading|trailing|karras`` — go beyond it);
        compiled variants are cached. When ``sampler`` is
        overridden without ``inference_steps``, that sampler's own default
        step count applies (50 for ddim/dpm/dpm3, the full schedule for
        ddpm), not the server sampler's. ``output_format``: "base64" (raw
        float32 bytes) or "nii" (a complete NIfTI-1 file, base64-encoded for
        the JSON envelope).
        """
        if not self.model_loaded:
            raise RuntimeError("model not loaded")
        if output_format not in ("base64", "nii"):
            raise ValueError(f"output_format must be base64|nii, got {output_format!r}")
        if timestep_spacing not in (None, "leading", "trailing", "karras"):
            raise ValueError(f"timestep_spacing must be leading|trailing|karras, "
                             f"got {timestep_spacing!r}")
        from ldm3d_tpu.cli.common import SAMPLERS

        if self.sampler == "distilled" and not self.is_dummy:
            # the distilled student's weights and few-step grid are a unit:
            # other samplers/step counts would run foreign grids on distilled
            # weights — reject instead of silently degrading
            if sampler not in (None, "distilled"):
                raise ValueError("server is running the distilled student; "
                                 "per-request sampler overrides are unavailable")
            if inference_steps is not None and int(inference_steps) != self.steps:
                raise ValueError(f"the distilled student has a fixed "
                                 f"{self.steps}-step grid")
            if guidance_scale is not None and float(guidance_scale) != 1.0:
                raise ValueError("guidance is unavailable on the distilled "
                                 "student: its guidance level was fixed at "
                                 "distillation time (ldm3d-distill "
                                 "--guidance-distill bakes a weight in)")
            if timestep_spacing is not None:
                raise ValueError("timestep_spacing is unavailable on the "
                                 "distilled student: its weights and few-step "
                                 "grid are a unit")
        elif sampler == "distilled":
            raise ValueError("start the server with sampler='distilled' to serve "
                             "the distilled student")
        elif sampler is not None and sampler not in SAMPLERS:
            raise ValueError(f"sampler must be one of {'|'.join(SAMPLERS)}, got {sampler!r}")
        sampler_name = sampler if sampler is not None else self.sampler
        if inference_steps is not None:
            steps = int(inference_steps)
        elif sampler_name != self.sampler and not self.is_dummy:
            from ldm3d_tpu.cli.common import default_sampler_steps

            steps = default_sampler_steps(sampler_name, self._sched_cfg)
        else:
            steps = self.steps
        guidance = float(guidance_scale) if guidance_scale is not None else 1.0
        if guidance != 1.0 and not self.is_dummy and self._cond_shape is None:
            # CFG is a no-op without conditioning (inferer.sample_latents
            # disables it when condition is None): normalize instead of
            # compiling/caching a byte-identical variant per guidance value,
            # and echo the APPLIED value so the client isn't misled
            log.info("guidance_scale %.2f ignored: unconditional model "
                     "(classifier-free guidance needs a conditional UNet)", guidance)
            guidance = 1.0
        # ONE resolution of the grid spacing this request actually runs:
        # request value > server --timestep-spacing > config default. Echoed
        # in the response; None only where no grid spacing applies (dummy
        # model, the distilled student's fixed grid).
        applied_spacing = None
        if not self.is_dummy and sampler_name != "distilled":
            server_spacing = (self.timestep_spacing
                              or self._sched_cfg.get("timestep_spacing", "leading"))
            applied_spacing = timestep_spacing or server_spacing
            if applied_spacing == "karras" and sampler_name == "ddpm":
                # fail fast with the request, not minutes later in the variant
                # compile thread (make_sampling_scheduler raises the same rule)
                raise ValueError(
                    "karras timestep_spacing is not available on the ancestral "
                    "ddpm sampler; use ddim, dpm, or dpm3"
                    + ("" if timestep_spacing is not None else
                       " (this server's default spacing is karras — pass "
                       "timestep_spacing='leading' or 'trailing' with the "
                       "ddpm request)"))
            if timestep_spacing == server_spacing:
                # an explicit request for the server's own default spacing
                # would compile a byte-identical variant — normalize onto the
                # default program
                timestep_spacing = None
        is_default = (sampler_name == self.sampler and steps == self.steps
                      and guidance == 1.0 and timestep_spacing is None)
        conditioning = "none"
        t0 = time.time()
        if self.is_dummy:
            with self._lock:
                rng = np.random.default_rng(seed)
                vols = rng.standard_normal((num_samples, *self.patch_size), dtype=np.float32)
                time.sleep(0.05)  # simulate latency like the reference dummy
        else:
            import jax
            import jax.numpy as jnp

            with self._lock:
                base = seed if seed is not None else self._rng_counter
                self._rng_counter += 1
            key = jax.random.PRNGKey(base)
            fixed_cond = None
            if self._cond_shape and condition_volume is not None:
                vol = np.asarray(condition_volume, np.float32)
                if vol.ndim == 3:
                    vol = vol[..., None]
                if list(vol.shape[:3]) != list(self.patch_size):
                    raise ValueError(
                        f"condition volume shape {vol.shape} does not match "
                        f"patch_size {self.patch_size}")
                key, ekey = jax.random.split(key)
                fixed_cond = self._encode_condition(
                    jnp.clip(jnp.asarray(vol[None]), 0, 1), ekey)
                conditioning = "provided"
            elif self._cond_shape:
                conditioning = "random"
            b = self.batch
            run = (self._run if is_default
                   else self._get_run(sampler_name, steps, guidance, timestep_spacing))
            # the micro-batcher runs the default-config compiled program only;
            # custom steps/guidance requests take the direct path
            batcher = self._batcher if is_default else None
            if num_samples == 1 and batcher is not None:
                # single-volume request: go through the micro-batcher, which
                # shares one compiled batch-B call among concurrent requests.
                # Exact: only deterministic samplers (ddim/dpm) get a batcher
                # (load_model skips it for ddpm), so a sample's value depends
                # only on its own noise, never on batch-mates.
                key, nkey, ckey = jax.random.split(key, 3)
                noise = np.asarray(jax.random.normal(nkey, self._latent_shape, jnp.float32))
                cond = None
                if self._cond_shape:
                    cond = (np.asarray(fixed_cond[0]) if fixed_cond is not None
                            else np.asarray(jax.random.normal(ckey, self._cond_shape, jnp.float32)))
                vol_out = batcher.submit(noise, cond, rng_seed=base, timeout=600)
                vols = _squeeze_single_channel(np.asarray(vol_out, dtype=np.float32))[None]
            else:
                fixed_cond_b = (jnp.tile(fixed_cond, (b,) + (1,) * (fixed_cond.ndim - 1))
                                if fixed_cond is not None else None)
                with self._device_lock:
                    # enqueue every batch's programs (run() returns
                    # un-materialized device arrays) while holding the lock...
                    pending = []
                    for _ in range((num_samples + b - 1) // b):
                        key, nkey, ckey, skey = jax.random.split(key, 4)
                        noise = jax.random.normal(nkey, (b, *self._latent_shape), jnp.float32)
                        if fixed_cond_b is not None:
                            cond = fixed_cond_b
                        else:
                            cond = (jax.random.normal(ckey, (b, *self._cond_shape), jnp.float32)
                                    if self._cond_shape else None)
                        pending.extend(run(noise, skey, cond))
                # ...but read back OUTSIDE it: host transfer of chunk i
                # overlaps device compute of chunk i+1 and of any concurrent
                # request that grabs the lock meanwhile (result buffers are
                # small next to in-flight activations, so coexistence is safe)
                vols = np.concatenate([
                    _squeeze_single_channel(np.asarray(p, dtype=np.float32))
                    for p in pending])[:num_samples]
        samples = []
        for v in vols:
            vmin, vmax = float(v.min()), float(v.max())
            norm = (v - vmin) / (vmax - vmin) if vmax > vmin else np.zeros_like(v)
            norm = norm.astype(np.float32)
            if output_format == "nii":
                from ldm3d_tpu.utils.nifti import nifti_bytes

                payload = nifti_bytes(norm)
            else:
                payload = norm.tobytes()
            samples.append({
                "data": base64.b64encode(payload).decode("ascii"),
                "shape": list(v.shape),
                "dtype": "float32",
                "format": output_format,
            })
        elapsed = time.time() - t0
        import uuid

        return {
            "samples": samples,
            "status": "success",
            "request_id": uuid.uuid4().hex,  # reference GenerationResponse field
            "generation_time": elapsed,
            "processing_time_ms": elapsed * 1000.0,
            "model_version": "dummy" if self.is_dummy else "ldm3d_tpu",
            "num_samples": num_samples,
            "sampler": "dummy" if self.is_dummy else sampler_name,
            "inference_steps": steps,
            "guidance_scale": guidance,
            # the APPLIED spacing (the server default when the request
            # omitted it); None only when no grid spacing applies (dummy
            # model, or the distilled student's fixed grid)
            "timestep_spacing": applied_spacing,
            "output_format": output_format,
            "conditioning": conditioning,
        }

    def model_info(self) -> dict[str, Any]:
        import jax

        return {
            "loaded": self.model_loaded,
            "dummy": self.is_dummy,
            "load_time": self.load_time,
            "patch_size": self.patch_size,
            "sampler": self.sampler,
            "steps": self.steps,
            "timestep_spacing": self.timestep_spacing,  # None = config default
            "backend": jax.default_backend(),
            "devices": [str(d) for d in jax.devices()],
            "micro_batching": (
                {"batch_size": self._batcher.batch_size,
                 "batches_run": self._batcher.batches_run,
                 "samples_run": self._batcher.samples_run}
                if self._batcher is not None else None),
        }
