"""Progress reporting for long batched solves.

The reference shows per-source tqdm bars during update() and two bars
(TTFs, rays) during find_all_TTF_rays_parallel (Anis_TTF_rays.py:3907,
:4645-4646) with a module-level ``tqdm_disable`` kill switch (:22-24).
The TPU build solves all sources as ONE batched program, so the natural
progress unit is the telescoping *stage* (4 per solve) plus the ray
batch -- reported through solver.solve_ttf's ``progress`` callback.

``alifmm_tpu.tqdm_disable`` mirrors the reference flag: set it True to
silence all bars (also honoured when tqdm is not importable or stderr is
not a tty-like stream under pytest).
"""

from __future__ import annotations

import sys

__all__ = ["progress_bar", "stage_reporter"]


def _disabled() -> bool:
    import alifmm_tpu

    return bool(getattr(alifmm_tpu, "tqdm_disable", False))


def progress_bar(total: int, desc: str):
    """A tqdm bar if available (and not disabled), else a no-op shim.

    Returned object supports ``update(n)``, ``set_postfix_str(s)`` and
    ``close()``.
    """
    if not _disabled():
        try:
            from tqdm import tqdm

            return tqdm(total=total, desc=desc, file=sys.stderr,
                        leave=True)
        except Exception:  # pragma: no cover - tqdm missing
            pass

    class _Noop:
        def update(self, n=1):
            pass

        def set_postfix_str(self, s):
            pass

        def close(self):
            pass

    return _Noop()


def stage_reporter(bar):
    """Adapt a progress_bar to solver.solve_ttf's ``progress`` callback
    (one tick per telescoping stage, stage name + seconds as postfix)."""

    def cb(stage, total, name, seconds):
        bar.set_postfix_str(f"{name} {seconds:.2f}s")
        bar.update(1)

    return cb


def auto_bar(desc: str):
    """solve_ttf ``progress`` callback that lazily opens a bar sized from
    the first callback's ``total`` and closes itself on the last stage.
    Returns None (no callback at all -- keeps dispatch asynchronous) when
    bars are disabled."""
    if _disabled():
        return None
    holder = {}

    def cb(stage, total, name, seconds):
        bar = holder.get("bar")
        if bar is None:
            bar = holder["bar"] = progress_bar(total, desc)
        bar.set_postfix_str(f"{name} {seconds:.2f}s")
        bar.update(1)
        if stage >= total:
            bar.close()

    return cb
