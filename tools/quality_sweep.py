#!/usr/bin/env python3
"""Run several bench.py --quality points inside ONE process.

The remote-tunnel TPU admits one client at a time, takes minutes to drain
a finished client, and stalls fresh clients at their first compile — so a
sweep of N separate bench.py processes pays N x (drain + entry + compile)
in dead wall-clock. This driver calls ``bench.main_quality`` repeatedly in
one process: one client, one entry stall, shared compile cache across
points that share shapes.

Each point is a JSON spec on the command line; its result line (the same
line bench.py would print) is appended to the per-point output file, so
``round5_battery.sh``'s resume logic keeps working.

    python tools/quality_sweep.py \
      '{"out": "tools/results_r5/quality_cell_k16.json",
        "model": {"LOG2_HASHMAP_SIZE": 16, "ENCODING_BACKEND": "cell"},
        "scene": "textured", "iters": 3000, "image_size": 128}' ...

Points whose output file already holds a JSON line are skipped.
"""

from __future__ import annotations

import contextlib
import io
import json
import sys
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _have(path: Path) -> bool:
    if not path.exists():
        return False
    return any(line.lstrip().startswith('{"metric"')
               for line in path.read_text(errors='replace').splitlines())


def run_point(spec: dict) -> None:
    import jax

    import bench

    out = Path(spec['out'])
    if _have(out):
        print(f'SKIP {out}', flush=True)
        return
    print(f'RUN  {out}', flush=True)
    buf = io.StringIO()
    try:
        # Tee stdout into the point's file so the JSON result line lands
        # where the battery's resume logic looks for it.
        with contextlib.redirect_stdout(buf):
            bench.main_quality(
                dict(spec.get('model') or {}),
                iterations=int(spec.get('iters', 3000)),
                image_size=int(spec.get('image_size', 128)),
                dynamic=bool(spec.get('dynamic', False)),
                scene=str(spec.get('scene', 'textured')),
                renderer_overrides=dict(spec.get('renderer') or {}),
                eval_every=int(spec.get('eval_every', 0)),
                seed=int(spec.get('seed', 0)))
    except Exception:
        out.write_text(buf.getvalue() + '\n' + traceback.format_exc())
        print(f'FAIL {out}', flush=True)
        return
    finally:
        # Bound jit-cache growth across points with different table shapes.
        jax.clear_caches()
    out.write_text(buf.getvalue())
    result = [ln for ln in buf.getvalue().splitlines()
              if ln.startswith('{"metric"')]
    print(f'DONE {out}: {result[-1] if result else "(no result line)"}',
          flush=True)


def main() -> int:
    for arg in sys.argv[1:]:
        run_point(json.loads(arg))
    return 0


if __name__ == '__main__':
    sys.exit(main())
