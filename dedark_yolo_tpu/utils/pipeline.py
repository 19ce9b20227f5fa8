"""Depth-2 dispatch/process pipelining for device loops.

The pattern every evaluation loop here uses: submit batch i+1 to the device
BEFORE blocking on batch i's readback, so the next batch's host work (decode,
letterbox, upload) overlaps the current batch's execution — one thread, no
cross-thread readbacks (remote transports stall on those; see
engine/server.py). The predictor's generator and the server's stop-flag loop
keep specialized copies of the same two-liner; validators share this one.
"""

from __future__ import annotations


def pipelined(items, dispatch, process):
    """For each item: out = dispatch(item) (async device submit), then
    process() the PREVIOUS out — results are processed strictly in dispatch
    order, one step behind. A dispatch returning None is skipped."""
    pending = None
    for it in items:
        out = dispatch(it)
        if pending is not None:
            process(pending)
        pending = out
    if pending is not None:
        process(pending)
