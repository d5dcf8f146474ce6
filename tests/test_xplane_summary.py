"""tools/xplane_summary.py aggregation test on a synthesized xplane proto."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

tf_protos = pytest.importorskip(
    "tensorflow.tsl.profiler.protobuf.xplane_pb2",
    reason="bundled tensorflow protos unavailable")

from tools import xplane_summary  # noqa: E402


def _write_space(tmp_path):
    sp = tf_protos.XSpace()
    plane = sp.planes.add()
    plane.name = "/device:TPU:0"
    plane.event_metadata[1].id = 1
    plane.event_metadata[1].name = "fusion.1"
    plane.event_metadata[2].id = 2
    plane.event_metadata[2].name = "copy.2"
    line = plane.lines.add()
    for md_id, dur in [(1, 5_000_000), (1, 7_000_000), (2, 1_000_000)]:
        ev = line.events.add()
        ev.metadata_id = md_id
        ev.duration_ps = dur
    # A host plane that must be ignored.
    host = sp.planes.add()
    host.name = "/host:CPU"
    d = tmp_path / "plugins" / "profile" / "run1"
    d.mkdir(parents=True)
    with open(d / "vm.xplane.pb", "wb") as f:
        f.write(sp.SerializeToString())
    return str(tmp_path)


def test_summarize_aggregates_per_op(tmp_path):
    trace_dir = _write_space(tmp_path)
    out = xplane_summary.summarize(trace_dir, top_n=5)
    assert len(out) == 1
    plane_name, rows = out[0]
    assert plane_name == "/device:TPU:0"
    # fusion.1: 12 us total over 2 events, sorted first.
    assert rows[0][0] == "fusion.1"
    assert rows[0][1] == [12_000_000, 2]
    assert rows[1][0] == "copy.2"
    assert rows[1][1] == [1_000_000, 1]


def test_main_prints_table(tmp_path, capsys):
    trace_dir = _write_space(tmp_path)
    xplane_summary.main([trace_dir, "3"])
    out = capsys.readouterr().out
    assert "/device:TPU:0" in out and "fusion.1" in out
