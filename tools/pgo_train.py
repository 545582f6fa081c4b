#!/usr/bin/env python3
"""Train a profile-guided-optimization profile for the native front-end.

Builds an instrumented libhevcfe, decodes a representative stream through
it in a subprocess (the residual/CABAC hot loops dominate,
frontend.cc decode_residual ~ hevc_cabac.c:1372-1950), and leaves the
.gcda profile under openhevc_tpu/native/pgo/ where build_lib() picks it
up with -fprofile-use on the next rebuild.

Usage: python tools/pgo_train.py [stream.265 ...]
(default: the cached 1080p + Main-10 bench streams)
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from openhevc_tpu.native import _CC, _DIR, _TABLES, _STAMP  # noqa: E402


def main():
    if not os.path.exists(_TABLES):
        from openhevc_tpu.native.gen_tables import generate
        generate(_TABLES)
    pgo = os.path.join(_DIR, "pgo")
    os.makedirs(pgo, exist_ok=True)
    for f in os.listdir(pgo):
        if f.endswith(".gcda"):
            os.remove(os.path.join(pgo, f))
    so = os.path.join(pgo, "frontend_train.so")
    subprocess.run(["g++", "-O3", "-march=native", "-shared", "-fPIC",
                    "-std=c++17", "-pthread", f"-fprofile-generate={pgo}",
                    _CC, "-o", so], check=True)

    streams = sys.argv[1:]
    if not streams:
        # default to the committed bench clips, resolved through bench's
        # content-hash cache keys (never hardcode stream filenames)
        sys.path.insert(0, REPO)
        import bench
        streams = [bench.stream_path(n, bench.CONFIGS[n])
                   for n in ("1080p_main", "1080p_main10")]
    streams = [s for s in streams if os.path.exists(s)]
    if not streams:
        print("no training streams found", file=sys.stderr)
        return 1
    child = (
        "import sys\n"
        "from openhevc_tpu.decoder.frontend import Frontend\n"
        "from openhevc_tpu.decoder.refs import DPB\n"
        "for path in sys.argv[1:]:\n"
        "    fe = Frontend(dpb=DPB(), use_native=True)\n"
        "    plans = fe.decode_bytes(open(path, 'rb').read())\n"
        "    print(path, len(plans), 'frames')\n"
    )
    env = dict(os.environ)
    env["OPENHEVC_NATIVE_SO"] = so
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    subprocess.run([sys.executable, "-c", child] + streams, env=env,
                   check=True, cwd=REPO)
    os.remove(so)
    # gcc writes the profile under <pgo>/<mirrored -o path>-<src>.gcda;
    # the consuming build (-o .../libhevcfe.so) looks for its OWN mangled
    # name, so place a copy where -fprofile-use will actually find it
    import shutil
    gcdas = [os.path.join(r, f) for r, _d, fs in os.walk(pgo)
             for f in fs if f.endswith(".gcda")]
    assert gcdas, "training produced no .gcda profile"
    target_dir = os.path.join(pgo, *os.path.normpath(_DIR).split(os.sep))
    os.makedirs(target_dir, exist_ok=True)
    target = os.path.join(target_dir, "libhevcfe.so-frontend.gcda")
    shutil.copyfile(gcdas[0], target)
    if os.path.exists(_STAMP):
        os.remove(_STAMP)           # force a -fprofile-use rebuild
    print("PGO profile written to", pgo)
    return 0


if __name__ == "__main__":
    sys.exit(main())
