"""`compact` CLI: coalesces a long tail of tiny parquet files into
~target-size outputs with identical rows; refuses stale output dirs."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq


def _write_small_files(d: str, n_files: int = 20, rows_each: int = 50) -> int:
    os.makedirs(d, exist_ok=True)
    total = 0
    for i in range(n_files):
        t = pa.table(
            {
                "k": pa.array(
                    range(i * rows_each, (i + 1) * rows_each), pa.int64()
                ),
                "v": pa.array([f"row{i}-{j}" for j in range(rows_each)]),
            }
        )
        pq.write_table(t, os.path.join(d, f"part-{i:05d}.parquet"))
        total += rows_each
    return total


def test_compact_coalesces_and_preserves_rows(ray_session, tmp_path, capsys):
    from commoncrawl_ray.cli import main

    src = str(tmp_path / "small")
    out = str(tmp_path / "compacted")
    total = _write_small_files(src)
    rc = main(["compact", "--input", src, "--output", out, "--target-mb", "64"])
    assert rc == 0
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(files) == info["files_out"] <= 4  # 20 tiny files collapsed
    got = pq.read_table(out)
    assert got.num_rows == total
    assert sorted(got.column("k").to_pylist()) == list(range(total))


def test_compact_refuses_nonempty_output(ray_session, tmp_path, capsys):
    from commoncrawl_ray.cli import main

    src = str(tmp_path / "small2")
    out = str(tmp_path / "stale")
    _write_small_files(src, n_files=2)
    os.makedirs(out)
    pq.write_table(pa.table({"x": [1]}), os.path.join(out, "old.parquet"))
    rc = main(["compact", "--input", src, "--output", out])
    assert rc == 2
    # stale file untouched, nothing added
    assert os.listdir(out) == ["old.parquet"]
