"""End-to-end spark-submit --py-files exercise of the north-rule run surface.

The north rule requires the engine to "run via spark-submit --py-files on a
multi-executor cluster". This test executes that exact deployment shape, not
an in-process stand-in: `runner.py` is copied ALONE into a neutral scratch
directory (the primary file's own dir is sys.path[0], and it contains no
package), PYTHONPATH is stripped, and the package must therefore reach the
driver AND the executor Python workers (which unpickle the Arrow-UDF
closures of the audio rule) exclusively through the freshly built
`--py-files` archive.

Two invocations against the same checkpoint dir also prove the resume
contract end-to-end: the second run anti-joins completed partitions from
the lineage table and validates nothing.

≙ reference deployment: `tb push` + scheduled copy-pipe run
(`/root/reference/tinybird/pipes/copy_out_of_range.pipe:49-51`), whose
Spark-native equivalent is exactly one spark-submit per scheduled window.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "use_case_real_time_anomaly_detection_spark"
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"

pytestmark = pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not on this machine"
)


def _submit(workdir: str, *args: str) -> dict:
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master",
            "local[4]",
            "--py-files",
            "engine_pyfiles.zip",
            "runner.py",
            *args,
        ],
        cwd=workdir,
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    json_lines = [
        ln for ln in proc.stdout.splitlines() if ln.startswith("{")
    ]
    assert json_lines, proc.stdout[-2000:]
    return json.loads(json_lines[-1])


def test_spark_submit_pyfiles_end_to_end(tmp_path):
    from tools.package_pyfiles import build

    build(str(tmp_path / "engine_pyfiles.zip"))
    shutil.copy(os.path.join(ROOT, PKG, "runner.py"), tmp_path)

    out = _submit(
        str(tmp_path),
        "--synth",
        "2x50",
        "--checkpoint-dir",
        str(tmp_path / "ckpt"),
    )
    # deterministic synth fixture → exact verdicts (same numbers the
    # in-process engine tests assert via plans.clips)
    assert out["partitions_validated"] == 2
    assert out["clips_validated"] == 81
    assert out["violations"] == 25
    # the audio rule ran on executors → its Arrow UDF closure was
    # unpickled from the --py-files archive, not a local install
    assert out["per_detector"]["audio-decode"] == 2
    assert out["per_detector"]["rate-of-change"] == 8
    assert out["per_detector"]["interquartile-range"] == 4

    # resume: identical second submission must skip every completed
    # partition via the lineage table
    out2 = _submit(
        str(tmp_path),
        "--synth",
        "2x50",
        "--checkpoint-dir",
        str(tmp_path / "ckpt"),
    )
    assert out2["partitions_validated"] == 0
    assert out2["violations"] == 0

    # the run also maintained the mergeable profile-state table
    # (one pk=... partition dir per validated clip partition)
    state_dir = tmp_path / "ckpt" / "profile_state"
    assert sorted(
        p.name for p in state_dir.iterdir() if p.name.startswith("pk=")
    ) == ["pk=c000", "pk=c001"]
