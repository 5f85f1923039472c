"""Training driver: the HF-Trainer/DeepSpeed replacement.

Orchestrates the reference recipe (llava/train/train.py:887-1141 +
llava_trainer.py) TPU-natively: modality-grouped batch order, background
host data loading (decode+preprocess threads double-buffering ahead of the
device), GSPMD-sharded train step, periodic orbax checkpoints with
auto-resume, per-step loss logging.
"""

from __future__ import annotations

import queue
import signal
import threading
import time
from typing import Callable, Iterator, List, Optional

import jax

from videollamb_tpu.config import ModelConfig, TrainConfig
from videollamb_tpu.models.assembly import MultimodalBatch
from videollamb_tpu.train.checkpoint import maybe_resume, save_checkpoint
from videollamb_tpu.train.dataset import Collator, SupervisedDataset, modality_grouped_indices
from videollamb_tpu.train.step import (
    TrainState,
    create_optimizer,
    create_train_state,
    make_train_step,
)


def process_local_order(
    order: List[int], global_batch: int, process_count: int, process_index: int,
) -> List[int]:
    """Slice a global modality-grouped order into this process's rows:
    every global batch contributes its ``process_index``-th contiguous
    chunk (reference: llava_trainer.py:59-146 world_size semantics, where
    each rank consumes a disjoint slice of every megabatch)."""
    local = global_batch // process_count
    out: List[int] = []
    for start in range(0, len(order) - global_batch + 1, global_batch):
        gb = order[start: start + global_batch]
        out.extend(gb[process_index * local: (process_index + 1) * local])
    return out


class Prefetcher:
    """Background-thread batch producer: keeps ``depth`` collated batches
    ready so host decode/tokenize overlaps device compute (the reference
    gets this from torch DataLoader workers).

    ``start_batch`` supports cheap resume: earlier batches are never
    enqueued, so fast-forwarding a resumed run does ZERO video decodes.

    ``depth`` bounds the lookahead: workers block once ``depth`` collated
    batches are ready but unconsumed, so host memory holds O(depth)
    decoded batches regardless of epoch length (16-frame video batches
    are tens of MB each — an unbounded queue would buffer the epoch)."""

    def __init__(self, dataset, order: List[int], batch_size: int,
                 collator: Collator, num_threads: int = 2,
                 start_batch: int = 0, depth: int = 4):
        self.dataset = dataset
        self.order = order
        self.batch_size = batch_size
        self.collator = collator
        self.num_batches = len(order) // batch_size
        self.start_batch = min(start_batch, self.num_batches)
        self.depth = max(depth, num_threads)
        self._batch_queue = queue.Queue()
        for b in range(self.start_batch, self.num_batches):
            self._batch_queue.put(b)
        self._results = {}
        self._next = self.start_batch  # next batch the consumer will take
        self._stopped = False
        self._cv = threading.Condition()
        self._threads = []
        for _ in range(num_threads):
            t = threading.Thread(target=self._worker, daemon=True)
            t.start()
            self._threads.append(t)

    def _worker(self):
        while True:
            try:
                b = self._batch_queue.get_nowait()
            except queue.Empty:
                return
            # Backpressure: don't run further than `depth` batches past the
            # consumer's cursor.
            with self._cv:
                while not self._stopped and b >= self._next + self.depth:
                    self._cv.wait()
                if self._stopped:
                    return
            idxs = self.order[b * self.batch_size: (b + 1) * self.batch_size]
            batch = self.collator([self.dataset[i] for i in idxs])
            with self._cv:
                self._results[b] = batch
                self._cv.notify_all()

    def stop(self) -> None:
        """Release worker threads early (preempted / abandoned epoch)."""
        with self._cv:
            self._stopped = True
            self._cv.notify_all()

    def __iter__(self) -> Iterator[MultimodalBatch]:
        for b in range(self.start_batch, self.num_batches):
            with self._cv:
                while b not in self._results:
                    if self._stopped:
                        return
                    self._cv.wait()
                batch = self._results.pop(b)
                self._next = b + 1
                self._cv.notify_all()
            yield batch


class GracefulShutdown:
    """SIGTERM/SIGINT -> "finish the current step, checkpoint, exit 0".

    TPU pods (especially preemptible/spot capacity) are reclaimed with a
    SIGTERM and a short grace window; the reference's only story is a
    slurm job restart from the last periodic checkpoint (SURVEY §5.3).
    Here the handler just sets a flag — the training loop checks it after
    every step, saves, and returns cleanly, so at most ONE step of work is
    lost regardless of ``save_steps``.

    Usable as a context manager; restores prior handlers on exit. Signal
    handlers can only be installed in the main thread — elsewhere (tests,
    notebook executors) installation degrades to a no-op flag that can
    still be set programmatically via :meth:`request`.
    """

    SIGNALS = (signal.SIGTERM, signal.SIGINT)

    def __init__(self):
        self._flag = threading.Event()
        self._prev = {}

    def __enter__(self) -> "GracefulShutdown":
        try:
            for sig in self.SIGNALS:
                self._prev[sig] = signal.signal(sig, self._handle)
        except ValueError:  # not the main thread
            self._prev = {}
        return self

    def __exit__(self, *exc) -> None:
        for sig, prev in self._prev.items():
            signal.signal(sig, prev)
        self._prev = {}

    def _handle(self, signum, frame) -> None:
        self._flag.set()

    def request(self) -> None:
        """Programmatic preemption (tests, external schedulers)."""
        self._flag.set()

    @property
    def requested(self) -> bool:
        return self._flag.is_set()


class Trainer:
    """End-to-end training loop."""

    def __init__(
        self,
        model_cfg: ModelConfig,
        train_cfg: TrainConfig,
        params,
        dataset: SupervisedDataset,
        collator: Optional[Collator] = None,
        mesh=None,
        log_fn: Callable[[dict], None] = None,
        process_count: Optional[int] = None,
        process_index: Optional[int] = None,
        step_factory: Optional[Callable] = None,
    ):
        self.model_cfg = model_cfg
        self.train_cfg = train_cfg
        self.dataset = dataset
        if train_cfg.pack_sequences and (train_cfg.rmt_loss
                                         or step_factory is not None):
            # The retro (per-segment-loss) path and the alternative step
            # factories (seq-parallel, pipeline) splice without segment
            # routing — packing under them would silently cross-attend.
            raise ValueError("pack_sequences is incompatible with rmt_loss "
                             "and custom step factories")
        self.mesh = mesh
        self.log_fn = log_fn or (lambda m: print(m, flush=True))
        # Multi-host data parallelism (reference: llava_trainer.py:59-146
        # world_size semantics): each process decodes only its slice of
        # every global batch.
        self.process_count = process_count if process_count is not None else jax.process_count()
        self.process_index = process_index if process_index is not None else jax.process_index()

        n_devices = jax.device_count() if mesh is None else mesh.devices.size
        global_batch = train_cfg.per_device_batch_size * max(
            1, n_devices if mesh is None else mesh.shape.get("data", 1)
        )
        self.global_batch = global_batch

        if collator is not None:
            self.collator = collator
        elif train_cfg.pack_sequences:
            from videollamb_tpu.models.assembly import measure_block_tokens
            from videollamb_tpu.train.dataset import PackedCollator

            # The packing budget is per modality: image/audio blocks expand
            # to a different spliced-token count than video blocks, and the
            # modality-grouped sampler delivers image-only batches from a
            # mixed dataset. The packed batch shape is PINNED (rows = this
            # process's row slice, t = max_length, k = k_max, frames from
            # the dataset config) so every step compiles once and row
            # counts agree across processes; overflow samples carry to the
            # next step inside the collator.
            data_cfg = getattr(dataset, "cfg", None)
            self.collator = PackedCollator(
                max_length=model_cfg.max_length,
                block_tokens=measure_block_tokens(params, model_cfg, "video"),
                block_tokens_image=measure_block_tokens(
                    params, model_cfg, "image"),
                fixed_rows=max(1, global_batch // self.process_count),
                fixed_frames=getattr(data_cfg, "num_frames", None),
            )
        else:
            self.collator = Collator(max_length=model_cfg.max_length)
        samples_per_step = global_batch * (
            max(1, train_cfg.pack_factor) if train_cfg.pack_sequences else 1
        )
        steps_per_epoch = max(1, len(dataset) // samples_per_step)
        self.total_steps = steps_per_epoch * train_cfg.num_train_epochs

        self.tx = create_optimizer(train_cfg, self.total_steps, params)
        self.state = create_train_state(params, self.tx)
        self.state = maybe_resume(train_cfg.output_dir, self.state)
        if step_factory is not None:
            # Alternative step builders (e.g. the sequence-parallel
            # multimodal step, parallel/seq_parallel.py) — receive the
            # trainer's optimizer, return a ready (jitted) step fn.
            self.step_fn = step_factory(model_cfg, self.tx, train_cfg)
        else:
            # Donating the state lets XLA reuse the old params/opt-state
            # buffers for the new ones — without it the step holds TWO
            # copies of the optimizer state at its peak, which is the
            # difference between the 7B stage-2 recipe fitting a v5e-8
            # and not (certified by tools/aot_memory.py). The loop never
            # touches the old state after the call.
            from videollamb_tpu.train.step import trainable_mask

            self.step_fn = jax.jit(
                make_train_step(
                    model_cfg, self.tx,
                    remat=train_cfg.gradient_checkpointing,
                    rmt_loss=train_cfg.rmt_loss,
                    # Frozen subtrees (towers; everything but the projector
                    # in adapter mode) are stop_gradient-ed so their
                    # backward is pruned — matches the reference's
                    # requires_grad=False freezing, where clip_grad_norm
                    # and activation memory never see the frozen parts.
                    mask=trainable_mask(train_cfg, params),
                ),
                donate_argnums=(0,),
            )

    def _batch_order(self, epoch: int) -> List[int]:
        """Process-local sample order: identical global shuffle on every
        process (same seed), then this process's slice of each batch."""
        lengths = self.dataset.modality_lengths()
        order = modality_grouped_indices(
            lengths,
            batch_size=max(1, self.global_batch // self.process_count),
            world_size=self.process_count,
            seed=self.train_cfg.seed + epoch,
        )
        if self.process_count == 1:
            return order
        return process_local_order(
            order, self.global_batch, self.process_count, self.process_index
        )

    def train(self, shutdown: Optional[GracefulShutdown] = None) -> TrainState:
        """Run the recipe. If ``shutdown`` is provided (or by default,
        installing one), a SIGTERM/SIGINT mid-run finishes the in-flight
        step, checkpoints, and returns — preemption loses at most one step
        (auto-resume picks the run back up decode-free)."""
        if shutdown is None:
            with GracefulShutdown() as shutdown:
                return self._train_loop(shutdown)
        return self._train_loop(shutdown)

    def _train_loop(self, shutdown: GracefulShutdown) -> TrainState:
        rng = jax.random.PRNGKey(self.train_cfg.seed)
        start_step = int(self.state.step)
        local_batch = max(1, self.global_batch // self.process_count)
        if self.train_cfg.pack_sequences:
            # Packing: each step consumes pack_factor x the samples, packed
            # into (about) local_batch rows — same compiled step shape, more
            # data per step.
            local_batch *= max(1, self.train_cfg.pack_factor)
        for epoch in range(self.train_cfg.num_train_epochs):
            order = self._batch_order(epoch)
            num_batches = len(order) // local_batch
            # Decode-free resume: batches before the checkpoint step are
            # never enqueued, so fast-forward costs zero video decodes.
            skip = min(max(start_step - epoch * num_batches, 0), num_batches)
            prefetcher = Prefetcher(
                self.dataset, order, local_batch, self.collator,
                start_batch=skip,
            )
            for batch in prefetcher:
                t0 = time.perf_counter()
                self.state, metrics = self.step_fn(self.state, batch, rng)
                step = int(self.state.step)
                if step % self.train_cfg.logging_steps == 0:
                    self.log_fn({
                        "step": step,
                        "loss": float(metrics["loss"]),
                        "grad_norm": float(metrics["grad_norm"]),
                        "tokens": int(metrics["tokens"]),
                        "step_time": round(time.perf_counter() - t0, 3),
                    })
                if shutdown.requested:
                    prefetcher.stop()
                    self._save(step)
                    self.log_fn({"step": step, "preempted": True,
                                 "checkpointed": True})
                    return self.state
                if self.train_cfg.save_steps and step % self.train_cfg.save_steps == 0:
                    self._save(step)
        self._save(int(self.state.step))
        return self.state

    def _save(self, step: int) -> None:
        save_checkpoint(
            self.train_cfg.output_dir, self.state, step=step,
            save_total_limit=self.train_cfg.save_total_limit,
            adapter_only=(self.train_cfg.tune_mode == "adapter"),
        )
