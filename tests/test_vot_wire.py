"""TraX wire-format conformance: transcript replay against eval/trax_wire.py.

Fixture provenance (VERDICT r3 #8 — live-capture attempt, 2026-08-20):
a real toolkit capture was attempted and is impossible in this environment.
`import vot` and `import trax` both fail (no wheel cache, zero egress), and
the reference's own client (`/root/reference/lib/test/vot20/vot.py:14`)
hard-raises without the compiled `trax` package, so neither the toolkit
server nor the reference client can execute here.  The fixtures are
therefore hand-recorded client transcripts following the TraX v3 text
protocol specification (the byte format `trax.Server` emits over stdio when
the toolkit launches a tracker from trackers.ini).  They replace the earlier
object-level mock: every byte the tracker side emits is parsed back and
checked against the protocol, including quoting/escaping and multi-channel
(rgbt/rgbd) image arguments.  If a `trax`/`vot` wheel ever lands in this
image, replace `test_multichannel_transcript_replay`'s transcript with a
`trax.Server`-captured one.
"""
import io

import numpy as np

from multi_modal_tracking_tpu.eval.trax_wire import (TraxWireServer,
                                                     encode_message,
                                                     encode_rectangle,
                                                     parse_message,
                                                     parse_region)
from multi_modal_tracking_tpu.eval.vot import Rectangle, VOTClient, run_vot_exp


def test_message_round_trip_with_escapes():
    line = encode_message("frame", ['/data/my seq/00000001.jpg',
                                    '/data/weird"name\\x.png'],
                          {"trax.timestamp": "17.5"})
    name, args, props = parse_message(line)
    assert name == "frame"
    assert args == ['/data/my seq/00000001.jpg', '/data/weird"name\\x.png']
    assert props == {"trax.timestamp": "17.5"}


def test_parse_region_rectangle_and_polygon_bounds():
    assert parse_region("10,20,30,40") == (10.0, 20.0, 30.0, 40.0)
    # polygon reduces to bounds like trax.Region.bounds()
    x, y, w, h = parse_region("0,0,10,0,10,6,0,6")
    assert (x, y, w, h) == (0.0, 0.0, 10.0, 6.0)


def _drive(transcript, channels=("color", "ir")):
    fin, fout = io.StringIO(transcript), io.StringIO()
    server = TraxWireServer(channels=channels, fin=fin, fout=fout)
    return server, fout


def test_hello_advertises_capabilities():
    _, fout = _drive("", channels=("color", "ir"))
    name, args, props = parse_message(fout.getvalue().splitlines()[0])
    assert name == "hello" and args == []
    assert props["trax.version"] == "3"
    assert props["trax.region"] == "rectangle"
    assert props["trax.image"] == "path"
    assert props["trax.channels"] == "color,ir"
    assert props["vot"] == "python"


def test_multichannel_transcript_replay():
    transcript = (
        '@@TRAX:initialize "/d/seq 01/color/0001.jpg" '
        '"/d/seq 01/ir/0001.jpg" "10.0,20.0,30.0,40.0"\n'
        "random toolkit logging that must be ignored\n"
        '@@TRAX:frame file:///d/seq%2001.jpg "/d/seq 01/ir/0002.jpg"\n'
        "@@TRAX:quit\n"
    )
    server, fout = _drive(transcript)
    req = server.wait()
    assert req.type == "initialize"
    assert req.region == (10.0, 20.0, 30.0, 40.0)
    assert req.image == ["/d/seq 01/color/0001.jpg", "/d/seq 01/ir/0001.jpg"]
    server.status(req.region)
    req = server.wait()
    assert req.type == "frame"
    assert req.image == ["/d/seq%2001.jpg", "/d/seq 01/ir/0002.jpg"]
    server.status(Rectangle(11.5, 21.5, 29.0, 39.0),
                  {"confidence": 0.875})
    assert server.wait().type == "quit"

    lines = fout.getvalue().splitlines()
    assert parse_message(lines[0])[0] == "hello"
    name, args, props = parse_message(lines[1])
    assert name == "state" and parse_region(args[0]) == (10.0, 20.0, 30.0, 40.0)
    name, args, props = parse_message(lines[2])
    assert name == "state"
    assert parse_region(args[0]) == (11.5, 21.5, 29.0, 39.0)
    assert float(props["confidence"]) == 0.875


def test_eof_is_quit():
    server, _ = _drive('@@TRAX:initialize "a.jpg" "b.jpg" "1,2,3,4"\n')
    assert server.wait().type == "initialize"
    assert server.wait().type == "quit"      # stream closed, no quit message


class _DummyTracker:
    update_interval = 1

    def initialize(self, imgs, info):
        self.box = list(info["init_bbox"])

    def track(self, imgs):
        self.box[0] += 1.0
        return {"target_bbox": list(self.box), "pred_score": 0.5}


def test_run_vot_exp_over_wire(tmp_path, monkeypatch):
    """Full experiment loop through VOTClient over the text protocol with a
    2-frame rgbt transcript; emitted states must track the dummy boxes."""
    import cv2
    for ch in ("color", "ir"):
        for i in (1, 2, 3):
            p = tmp_path / f"{ch}_{i}.jpg"
            cv2.imwrite(str(p), np.full((32, 48, 3), 100, np.uint8))
    t = lambda ch, i: str(tmp_path / f"{ch}_{i}.jpg")
    transcript = (
        f'@@TRAX:initialize {t("color",1)} {t("ir",1)} "5,6,7,8"\n'
        f'@@TRAX:frame {t("color",2)} {t("ir",2)}\n'
        f'@@TRAX:frame {t("color",3)} {t("ir",3)}\n'
        "@@TRAX:quit\n"
    )
    fin, fout = io.StringIO(transcript), io.StringIO()
    server = TraxWireServer(channels=("color", "ir"), fin=fin, fout=fout)
    run_vot_exp("asymmetric_shared_ce", channels="rgbt", server=server,
                tracker=_DummyTracker())
    lines = fout.getvalue().splitlines()
    states = [parse_message(l) for l in lines if l.startswith("@@TRAX:state")]
    boxes = [parse_region(a[0]) for _, a, _ in states]
    assert boxes[0] == (5.0, 6.0, 7.0, 8.0)          # initialize echo
    assert boxes[1] == (6.0, 6.0, 7.0, 8.0)
    assert boxes[2] == (7.0, 6.0, 7.0, 8.0)
    assert float(states[2][2]["confidence"]) == 0.5
