"""Checkpoint I/O — single-file msgpack with the reference's logical schema.

The reference saves one ``.pt`` dict per checkpoint: step, generator,
discriminator, opt_G, opt_D, ema_G{decay, shadow}, scaler, metrics, config
(GAN_Variant1/utils/io_ckpt.py:56-87). Here the same logical contents are
serialized with flax msgpack (no pickle), written atomically, with three
improvements documented in SURVEY.md §5 "Checkpoint / resume":

- ``keep_last_n`` pruning is actually enforced (the reference reads the key
  but never prunes, §2.6 item 3);
- the PRNG base key and the data-epoch state can be included so resume is
  bitwise-reproducible;
- ``latest_checkpoint`` scans a directory for auto-resume on preemptible
  TPU VMs.
"""

from __future__ import annotations

import json
import os
import re
from concurrent.futures import Future, ThreadPoolExecutor
from pathlib import Path
from typing import Any, Callable

import flax.serialization
import jax
import numpy as np

_STEP_RE = re.compile(r"ckpt_step(\d+)\.msgpack$")


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    path: str | Path,
    step: int,
    payload: dict[str, Any],
    config: dict | None = None,
    metrics: dict | None = None,
    keep_last_n: int | None = None,
) -> Path:
    """Serialize ``payload`` (arbitrary pytree dict: generator params, EMA
    shadow, optimizer states, …) plus step/config/metrics to ``path``.

    Atomic: writes ``path.tmp`` then renames. If ``keep_last_n`` is given,
    older ``ckpt_step*.msgpack`` siblings beyond N are deleted
    (``ckpt_final`` is never pruned).
    """
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    blob = {
        "step": int(step),
        # to_state_dict flattens namedtuple optimizer states etc. into plain
        # dicts so msgpack can serialize them
        "payload": flax.serialization.to_state_dict(_to_host(payload)),
        "config_json": json.dumps(config or {}),
        "metrics_json": json.dumps(metrics or {}),
    }
    data = flax.serialization.msgpack_serialize(blob)
    tmp = path.with_suffix(path.suffix + ".tmp")
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)

    if keep_last_n is not None and keep_last_n > 0:
        cur_m = _STEP_RE.search(path.name)
        cur = int(cur_m.group(1)) if cur_m else None
        steps = []
        for p in path.parent.glob("ckpt_step*.msgpack"):
            m = _STEP_RE.search(p.name)
            if m:
                steps.append((int(m.group(1)), p))
        steps.sort()
        # Prune only checkpoints at or below the one just written: after a
        # rollback-resume the dir can hold STALE files from a further-along
        # run (e.g. ckpt_step12000..20000 while we re-save step 11000) —
        # counting those against keep_last_n would delete the file we just
        # wrote and every subsequent save until the old high-water mark is
        # passed. Stale future files are left alone (they prune normally
        # once the run overtakes them); the just-written file is always the
        # newest eligible entry, so it survives any keep_last_n ≥ 1.
        eligible = [(n, p) for n, p in steps if cur is None or n <= cur]
        for _, p in eligible[:-keep_last_n]:
            p.unlink(missing_ok=True)
    return path


class AsyncCheckpointer:
    """Non-blocking checkpoint writes that overlap training.

    ``save_checkpoint`` blocks the train loop on device→host fetch +
    serialization + disk write (the reference's ``torch.save`` blocks the
    same way, utils/io_ckpt.py:56-87). JAX arrays are immutable, so the
    state pytree can instead be captured **by reference** and handed to one
    worker thread that does the fetch/serialize/write while the main thread
    keeps dispatching steps — the same overlap orbax's async checkpointing
    exploits, without the dependency. The worker holds the captured arrays
    alive until its write completes (≤ one extra state of HBM, briefly).

    Semantics:
    - depth-1 pipeline: ``save()`` first waits for the previous write, so at
      most one checkpoint is in flight and memory is bounded;
    - ``snapshot=True`` fetches the payload to host ON THE CALLER THREAD
      before enqueueing. Required when the train step donates its state
      buffers (``runtime.donate``): capture-by-reference is only safe while
      the buffers stay alive, and the next donated step invalidates them —
      the worker would read deleted arrays. With a snapshot only the
      serialize+write overlaps training (still the slow half: disk I/O);
    - atomicity is inherited from ``save_checkpoint`` (tmp + rename), so a
      crash mid-write never leaves a partial file for ``latest_checkpoint``;
    - errors are sticky: a failed write re-raises on every subsequent
      ``save()``/``wait()``/``close()`` (never silently dropped);
    - ``on_done(path)`` runs in the worker after the file is durable — use
      it for "saved" logging that must not lie.
    """

    def __init__(self):
        self._pool = ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="ckpt-writer")
        self._inflight: Future | None = None

    def save(
        self,
        path: str | Path,
        step: int,
        payload: dict[str, Any],
        config: dict | None = None,
        metrics: dict | None = None,
        keep_last_n: int | None = None,
        on_done: Callable[[Path], None] | None = None,
        snapshot: bool = False,
    ) -> Future:
        self.wait()
        if snapshot:
            # donated buffers die at the next step — copy to host now
            payload = _to_host(payload)

        def _job() -> Path:
            p = save_checkpoint(path, step, payload, config=config,
                                metrics=metrics, keep_last_n=keep_last_n)
            if on_done is not None:
                on_done(p)
            return p

        self._inflight = self._pool.submit(_job)
        return self._inflight

    def wait(self) -> None:
        """Block until the in-flight write (if any) is durable; re-raise its
        error. A failure stays sticky (the future is only cleared on
        success)."""
        if self._inflight is not None:
            self._inflight.result()
            self._inflight = None

    def close(self) -> None:
        try:
            self.wait()
        finally:
            self._pool.shutdown(wait=True)


def load_checkpoint(path: str | Path, target_payload=None) -> dict[str, Any]:
    """Load a checkpoint. With ``target_payload`` (a pytree of the expected
    structure) the arrays are restored into that structure; without it the
    raw nested dict is returned."""
    with open(path, "rb") as f:
        blob = flax.serialization.msgpack_restore(f.read())
    payload = blob["payload"]
    if target_payload is not None:
        payload = flax.serialization.from_state_dict(target_payload, payload)
    return {
        "step": int(blob["step"]),
        "payload": payload,
        "config": json.loads(blob.get("config_json", "{}")),
        "metrics": json.loads(blob.get("metrics_json", "{}")),
    }


def _stored_step(path: Path) -> int:
    """The authoritative step recorded INSIDE a checkpoint file.

    flax's msgpack serializer writes map keys sorted, so ``step`` is the
    LAST top-level entry and its uint value ends the file — decodable from
    the final 16 bytes. A flagship checkpoint is hundreds of MB, and fully
    deserializing it (once per candidate here, then again in
    ``load_checkpoint``) just to read one integer tripled resume startup
    I/O. Falls back to a full parse for any other layout."""
    with open(path, "rb") as f:
        f.seek(0, os.SEEK_END)
        size = f.tell()
        f.seek(max(0, size - 16))
        step = _peek_tail_step(f.read())
        if step is not None:
            return step
        f.seek(0)
        return int(flax.serialization.msgpack_restore(f.read())["step"])


def _peek_tail_step(tail: bytes) -> int | None:
    """Decode a trailing ``"step": <uint>`` msgpack entry from a file's last
    bytes; None unless a fixstr "step" key + uint value ends EXACTLY at EOF
    (the exact-end constraint is what makes a payload-byte coincidence
    effectively impossible)."""
    key = b"\xa4step"  # fixstr(4) "step"
    i = tail.rfind(key)
    if i < 0:
        return None
    v = tail[i + len(key):]
    if not v:
        return None
    b = v[0]
    if b <= 0x7F:  # positive fixint
        return b if len(v) == 1 else None
    widths = {0xCC: 1, 0xCD: 2, 0xCE: 4, 0xCF: 8}  # uint8/16/32/64
    n = widths.get(b)
    if n is None or len(v) != 1 + n:
        return None
    return int.from_bytes(v[1:], "big")


def latest_checkpoint(ckpt_dir: str | Path) -> Path | None:
    """The checkpoint auto-resume should continue from.

    ``ckpt_final`` wins only while it is actually the furthest-along state:
    when a completed run is extended (max_steps raised) and later preempted,
    the dir holds ``ckpt_final`` from the OLD completion alongside newer
    ``ckpt_step*`` files — preferring final unconditionally would roll every
    resume back to the old end state and the run could never make net
    progress. The stored step (not the filename) is compared: ckpt_final has
    no step in its name, and the stored value is the authoritative counter
    either way (periodic files store exactly their filename step)."""
    ckpt_dir = Path(ckpt_dir)
    if not ckpt_dir.is_dir():
        return None
    best = None
    best_step = -1
    for p in ckpt_dir.glob("ckpt_step*.msgpack"):
        m = _STEP_RE.search(p.name)
        if m and int(m.group(1)) > best_step:
            best_step = int(m.group(1))
            best = p
    if best is None:
        # CycleGAN epoch checkpoints (cyclegan_loop.py: ckpt_e{epoch})
        for p in ckpt_dir.glob("ckpt_e*.msgpack"):
            m = re.search(r"ckpt_e(\d+)", p.name)
            if m and int(m.group(1)) > best_step:
                best_step = int(m.group(1))
                best = p
    final = ckpt_dir / "ckpt_final.msgpack"
    if final.exists():
        if best is None or _stored_step(final) >= _stored_step(best):
            return final
    return best
