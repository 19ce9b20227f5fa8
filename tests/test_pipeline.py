"""utils/pipeline.py — depth-2 dispatch/process ordering semantics."""

from dedark_yolo_tpu.utils.pipeline import pipelined


def test_order_and_depth():
    log = []
    pipelined([1, 2, 3],
              dispatch=lambda i: (log.append(f"d{i}"), i)[1],
              process=lambda o: log.append(f"p{o}"))
    # process runs one step behind dispatch, in dispatch order
    assert log == ["d1", "d2", "p1", "d3", "p2", "p3"]


def test_none_dispatch_skipped():
    log = []
    pipelined([1, 2, 3],
              dispatch=lambda i: None if i == 2 else i,
              process=log.append)
    assert log == [1, 3]


def test_empty():
    pipelined([], dispatch=lambda i: i, process=lambda o: 1 / 0)
