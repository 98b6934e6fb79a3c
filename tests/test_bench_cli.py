"""bench.py CLI plumbing (no Spark): current_round must read the driver's
PROGRESS.jsonl tail and fall back to the BENCH_r*.json scan on ANY
malformed tail — including the ADVICE-r9 case of a last line that is
valid JSON but not an object (bare number/string/list), which used to
raise TypeError out of the whole bench run."""

import json

import pytest

from bench import current_round


def _repo(tmp_path, progress_tail=None, bench_rounds=()):
    for n in bench_rounds:
        (tmp_path / f"BENCH_r{n:02d}.json").write_text("{}")
    if progress_tail is not None:
        lines = [json.dumps({"round": 3}), progress_tail]
        (tmp_path / "PROGRESS.jsonl").write_text("\n".join(lines) + "\n")
    return tmp_path


def test_progress_tail_object_wins(tmp_path):
    root = _repo(tmp_path, json.dumps({"round": 7}), bench_rounds=(1, 2))
    assert current_round(root) == 7


@pytest.mark.parametrize(
    "tail",
    [
        "42",  # valid JSON, not an object → TypeError path (ADVICE r9)
        '"str"',
        "[1, 2]",
        "{not json",
        json.dumps({"no_round_key": 1}),
        json.dumps({"round": "seven"}),  # int() ValueError
    ],
)
def test_malformed_tail_falls_back_to_bench_scan(tmp_path, tail):
    root = _repo(tmp_path, tail, bench_rounds=(1, 4))
    assert current_round(root) == 5  # max(BENCH_r) + 1


def test_no_progress_no_bench(tmp_path):
    assert current_round(_repo(tmp_path)) == 1
