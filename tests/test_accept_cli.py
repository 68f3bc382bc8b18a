"""`accept` — the composed multi-writer upload-acceptance loop
(audit --gate → ingest → validate → manifest) and its exit-code contract."""

import json
import os
import subprocess
import sys

import pyarrow.parquet as pq


def _run(args, timeout=300):
    return subprocess.run(
        [sys.executable, "-m", "product_quality_check_ray", *args],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=timeout,
    )


def _last_json(out):
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_accept_full_loop_and_exit_codes(tmp_path):
    from product_quality_check_ray.datagen import write_sequences

    base = write_sequences(
        str(tmp_path / "base"), 2000, seed=1, corrupt=False, drift=False,
        num_fragments=4,
    )
    # one fragment per incoming batch: a multi-fragment batch from one
    # writer with interleaved id ranges is exactly what the gate's exit-5
    # layout check rejects (pinned below via the fixture's round-robin ids)
    inc = write_sequences(
        str(tmp_path / "inc"), 1000, seed=2, corrupt=False, drift=False,
        num_fragments=1,
    )

    # --- happy path: accepted, admitted rows validated, manifest written
    out1 = str(tmp_path / "w1")
    r = _run(
        ["accept", "--base", base, "--incoming", inc, "--out", out1,
         "--num-cpus", "4"]
    )
    assert r.returncode == 0, r.stdout + r.stderr[-2000:]
    summary = _last_json(r)
    assert summary["accept"] == "accepted" and summary["appended"] == 0
    adm = sorted(os.listdir(os.path.join(out1, "admitted")))
    assert adm and all(f.startswith("frag-") for f in adm if f.endswith(".parquet"))
    man = pq.read_table(os.path.join(out1, "manifest.parquet"))
    assert man.num_rows == summary["manifest_fragments"] >= 5  # base 4 + admitted
    assert os.path.isdir(os.path.join(out1, "validation"))

    # --- nothing new: a batch whose content is already fully in the base
    # (the batch offered against itself) → exit 7
    r2 = _run(
        ["accept", "--base", inc, "--incoming", inc,
         "--out", str(tmp_path / "w2"), "--num-cpus", "4"]
    )
    assert r2.returncode == 7, r2.stdout + r2.stderr[-2000:]
    assert _last_json(r2)["accept"] == "noop"

    # --- unreadable shard in the incoming batch → exit 3, nothing written
    bad = str(tmp_path / "bad")
    os.makedirs(bad)
    for f in sorted(os.listdir(inc)):
        if f.endswith(".parquet"):
            os.link(os.path.join(inc, f), os.path.join(bad, f))
    with open(os.path.join(bad, "frag-zz.parquet"), "wb") as fh:
        fh.write(b"not a parquet file")
    r3 = _run(
        ["accept", "--base", base, "--incoming", bad,
         "--out", str(tmp_path / "w3"), "--num-cpus", "4"]
    )
    assert r3.returncode == 3, r3.stdout + r3.stderr[-2000:]
    assert _last_json(r3)["stage"] == "audit"
    assert not os.path.exists(os.path.join(str(tmp_path / "w3"), "admitted"))


def test_accept_append_grows_base(tmp_path):
    """--append moves validated admitted fragments into the base corpus;
    a second accept of the same batch is then a no-op (exit 7)."""
    from product_quality_check_ray.datagen import write_sequences

    base = write_sequences(
        str(tmp_path / "base"), 1500, seed=3, corrupt=False, drift=False,
        num_fragments=3,
    )
    inc = write_sequences(
        str(tmp_path / "inc"), 800, seed=4, corrupt=False, drift=False,
        num_fragments=1,
    )
    n_before = len([f for f in os.listdir(base) if f.endswith(".parquet")])
    r = _run(
        ["accept", "--base", base, "--incoming", inc, "--out",
         str(tmp_path / "w"), "--append", "--num-cpus", "4"]
    )
    assert r.returncode == 0, r.stdout + r.stderr[-2000:]
    summary = _last_json(r)
    assert summary["appended"] >= 1
    n_after = len([f for f in os.listdir(base) if f.endswith(".parquet")])
    assert n_after == n_before + summary["appended"]
    # idempotence: the same batch re-offered is now fully duplicate
    r2 = _run(
        ["accept", "--base", base, "--incoming", inc, "--out",
         str(tmp_path / "w2"), "--num-cpus", "4"]
    )
    assert r2.returncode == 7, r2.stdout + r2.stderr[-2000:]
