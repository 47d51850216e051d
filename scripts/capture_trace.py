"""Capture an xplane trace of the parity train_clip step into /tmp/jtrace.

Usage: python scripts/capture_trace.py [n_iters]
Then:  PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
           python scripts/trace_summary.py /tmp/jtrace <n_iters>
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    n_iters = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    )
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from avatarclip_tpu.pipelines import synthetic

    out = "/tmp/jtrace"
    shutil.rmtree(out, ignore_errors=True)
    with tempfile.TemporaryDirectory() as d:
        runner = synthetic.make_runner(d, scale="full", res=256, n_views=4)
        runner.profile_trace(out, n_iters=n_iters)
    print(out)


if __name__ == "__main__":
    main()
