import json

from tpu3d.utils import Tracer


def test_tracer_spans_and_export(tmp_path):
    tr = Tracer()
    with tr.span("outer"):
        with tr.span("inner", n=3):
            pass
        tr.count("widgets", 2)
    s = tr.summary()
    assert s["spans"]["outer"]["count"] == 1
    assert s["spans"]["inner"]["count"] == 1
    assert s["counters"]["widgets"] == 2
    p = tmp_path / "trace.json"
    tr.export_chrome_trace(str(p))
    data = json.loads(p.read_text())
    assert len(data["traceEvents"]) == 2
