"""Example scripts run end-to-end on the bundled test data (the
reference tests its examples the same way, ``examples/*_test.py``)."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script: str, *args: str) -> str:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", script), *args],
        capture_output=True,
        text=True,
        timeout=300,
    )
    # no check=True: a CalledProcessError swallows the captured stderr;
    # assert instead so the pytest report shows the actual traceback
    assert out.returncode == 0, out.stderr[-4000:]
    return out.stdout


def test_events_climatology_example(tmp_path):
    out = _run(
        "events_climatology.py", "/root/testdata/sf0.001", str(tmp_path / "clim.zarr")
    )
    assert "wrote" in out and "NDDataset" in out
    assert os.path.exists(tmp_path / "clim.zarr" / "zarr.json")


def test_zarr_rechunk_example(tmp_path):
    src = str(tmp_path / "src.zarr")
    out_path = str(tmp_path / "out.zarr")
    # explicit private paths: the no-arg form writes fixed /tmp stores,
    # which two concurrent runs would race on
    stdout = _run("zarr_rechunk.py", src, out_path)
    assert "wrote" in stdout and "counters" in stdout
    # the example writes a Zarr v2 store: group metadata is .zgroup
    assert os.path.exists(os.path.join(out_path, ".zgroup"))


def test_corpus_pipeline_example(tmp_path):
    out = _run("corpus_pipeline.py", "/root/testdata/sf0.001", str(tmp_path / "corpus"))
    assert "corpus pipeline: raw=500" in out
    assert "wrote partitioned parquet" in out
    assert "exported train split: tfrecord shards=" in out
    import glob
    assert glob.glob(str(tmp_path / "corpus" / "split=train" / "*.parquet"))
    assert glob.glob(str(tmp_path / "corpus" / "tfrecord" / "*.tfrecord"))
    assert glob.glob(str(tmp_path / "corpus" / "wds" / "*.tar"))


def test_temporal_analytics_example():
    out = _run("temporal_analytics.py", "/root/testdata/sf0.001")
    assert "asof:" in out and "interval:" in out
    assert "trend NDDataset:" in out and "corr map:" in out


def test_cloud_zarr_sql_example(tmp_path):
    out = _run("cloud_zarr_sql.py", str(tmp_path))
    assert "opened over http:" in out
    assert "library path agrees:" in out


def test_append_ingest_example(tmp_path):
    out = _run("append_ingest.py", str(tmp_path / "ap.zarr"))
    assert "appended day 4" in out and "append ingest OK" in out


def test_beam_style_migration_example(tmp_path):
    out = _run("beam_style_migration.py", str(tmp_path))
    assert "spellings agree bit for bit" in out
    assert os.path.exists(tmp_path / "beam_spelling.zarr")


def _run_doc_snippets(doc_name: str, min_blocks: int) -> None:
    """Anti-drift harness shared by the doc tests: extract every
    ```python fenced block and execute them top-to-bottom in ONE shared
    namespace (each block asserts its own results)."""
    import re

    doc = open(os.path.join(REPO, "docs", doc_name)).read()
    blocks = re.findall(r"```python\n(.*?)```", doc, flags=re.DOTALL)
    assert len(blocks) >= min_blocks, f"{doc_name} lost its runnable snippets"
    script = "\n\n".join(blocks)
    out = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=540,
        cwd=REPO,
        env={
            **os.environ,
            # PREPEND: clobbering would break environments that supply
            # deps via PYTHONPATH
            "PYTHONPATH": REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
        },
    )
    assert out.returncode == 0, out.stderr[-4000:]


def test_migration_doc_snippets():
    _run_doc_snippets("migration.md", 8)


def test_training_doc_snippets():
    _run_doc_snippets("training_data.md", 7)
