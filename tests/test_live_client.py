"""Live MinKNOW client machinery against a fake ReadUntilClient.

Covers the run-state handling the reference adds on top of read_until
(minknow_client.py:95-226): wait-for-start with chunk-length config,
mux-scan detection suppressing ejections, and chunk dtype dispatch
(chunk.cpp:16-50) + the fast5 calibration u16-wrap quirk
(read_buffer.cpp:239).
"""

import types

import numpy as np
import pytest

from uncalled_tpu.config import Conf
from uncalled_tpu.realtime.client import (
    MK_PROCESSING, MK_READY, MK_STARTING, RN_RUNNING, RN_STARTING,
    MinknowClient, MuxScanMonitor, calibrate_fast5, chunk_signal_f32,
)


def _obj(**kw):
    return types.SimpleNamespace(**kw)


class FakeAnalysisConfig:
    def __init__(self, chunk_len=1.0):
        self.cfg = _obj(
            read_detection=_obj(
                break_reads_after_seconds=_obj(value=chunk_len)
            )
        )
        self.set_calls = 0

    def get_analysis_configuration(self):
        return self.cfg

    def set_analysis_configuration(self, cfg):
        self.cfg = cfg
        self.set_calls += 1


class FakeConnection:
    def __init__(self, statuses, chunk_len=1.0):
        self._statuses = list(statuses)
        self.analysis_configuration = FakeAnalysisConfig(chunk_len)
        self.acquisition = _obj(
            current_status=self._current_status,
            get_acquisition_info=lambda: _obj(state=RN_RUNNING),
        )
        self.data = _obj(get_channel_states=self._channel_states)
        self.state_batches = []

    def _current_status(self):
        s = self._statuses.pop(0) if len(self._statuses) > 1 else (
            self._statuses[0]
        )
        return _obj(status=s)

    def _channel_states(self, **kw):
        batches = [
            _obj(channel_states=[
                _obj(channel=c, config=_obj(well=w)) for c, w in batch
            ])
            for batch in self.state_batches
        ]

        class _Stream:
            def __init__(self, items):
                self._it = iter(items)

            def __iter__(self):
                return self

            def __next__(self):
                return next(self._it)

            def cancel(self):
                pass

        return _Stream(batches)


class FakeReadUntil:
    signal_dtype = "int16"
    queue_length = 16

    def __init__(self, connection):
        self.connection = connection
        self.is_running = True
        self.unblocked = []
        self.stopped = []
        self._chunks = []

    def run(self, **kw):
        pass

    def get_read_chunks(self, batch_size=1, last=True):
        out, self._chunks = self._chunks, []
        return out

    def unblock_read(self, ch, num):
        self.unblocked.append((ch, num))

    def stop_receiving_read(self, ch, num):
        self.stopped.append((ch, num))


def make_client(statuses, chunk_len=1.0, n_ch=8):
    conf = Conf()
    conf.reads.num_channels = n_ch
    conn = FakeConnection(statuses, chunk_len)
    fake = FakeReadUntil(conn)
    cl = MinknowClient(
        conf, "h", 8000, chunk_time=1.0,
        connection_factory=lambda: fake,
    )
    return cl, fake, conn


def test_wait_for_start_configures_chunk_len():
    """STARTING -> chunk length pushed; PROCESSING dwell -> ready."""
    cl, fake, conn = make_client(
        [MK_READY, MK_STARTING, MK_PROCESSING, MK_PROCESSING], chunk_len=0.5
    )
    t = [0.0]

    def clock():
        return t[0]

    def sleep(dt):
        t[0] += 5.0

    assert cl.wait_for_start(steady=10, refresh=0.01, clock=clock,
                             sleep=sleep)
    assert conn.analysis_configuration.set_calls == 1
    assert (
        conn.analysis_configuration.cfg
        .read_detection.break_reads_after_seconds.value == 1.0
    )


def test_wait_for_start_rejects_midrun_change():
    """Already PROCESSING with a different chunk length -> refuse."""
    cl, fake, conn = make_client([MK_PROCESSING], chunk_len=0.5)
    assert cl.wait_for_start() is False
    assert conn.analysis_configuration.set_calls == 0


def test_wait_for_start_ok_when_chunk_len_matches():
    cl, fake, conn = make_client([MK_PROCESSING], chunk_len=1.0)
    assert cl.wait_for_start() is True


def test_mux_scan_suppresses_ejects():
    mon = MuxScanMonitor(8, scan_thresh=0.99)
    assert mon.in_scan  # conservative default
    # normal sequencing: wells spread across 1..4
    mon.update([(c, 1 + (c % 4)) for c in range(1, 9)])
    assert not mon.in_scan
    # mux scan: every off-zero channel sits on well 2
    mon.update([(c, 2) for c in range(1, 9)])
    assert mon.in_scan
    # back to spread
    mon.update([(c, 1 + (c % 4)) for c in range(1, 9)])
    assert not mon.in_scan


def test_should_eject_follows_monitor():
    cl, fake, conn = make_client([MK_PROCESSING])
    cl.monitor.update([(c, 3) for c in range(1, 9)])
    assert cl.should_eject() is False
    cl.monitor.update([(c, 1 + (c % 4)) for c in range(1, 9)])
    assert cl.should_eject() is True


def test_monitor_thread_consumes_states_and_stops():
    cl, fake, conn = make_client([MK_PROCESSING, MK_PROCESSING, MK_READY])
    conn.state_batches = [
        [(c, 2) for c in range(1, 9)],  # scan
        [(c, 1 + (c % 4)) for c in range(1, 9)],  # spread -> not scan
    ]
    cl._start_monitor()
    cl._mon_thread.join(timeout=5)
    assert not cl._mon_thread.is_alive()
    assert cl.monitor.in_scan is False


def test_chunk_dtype_dispatch():
    i16 = np.array([-3, 10, 1000], np.int16)
    out = chunk_signal_f32(i16.tobytes(), "int16")
    # ints pass through numerically (reference leaves calibration
    # commented out, chunk.cpp:33-45)
    assert out.dtype == np.float32
    np.testing.assert_array_equal(out, [-3.0, 10.0, 1000.0])
    f32 = np.array([1.5, -2.25], np.float32)
    np.testing.assert_array_equal(chunk_signal_f32(f32.tobytes(), "float32"), f32)
    i32 = np.array([70000, -5], np.int32)
    np.testing.assert_array_equal(
        chunk_signal_f32(i32.tobytes(), "int32"), [70000.0, -5.0]
    )
    with pytest.raises(ValueError):
        chunk_signal_f32(b"", "uint8")


def test_get_read_chunks_decodes():
    cl, fake, conn = make_client([MK_PROCESSING])
    sig = np.array([1, 2, 3], np.int16)
    fake._chunks = [(3, _obj(raw_data=sig.tobytes(), number=7,
                             chunk_start_sample=100, id="r1"))]
    (ch, chunk), = cl.get_read_chunks()
    assert ch == 3 and chunk.number == 7 and chunk.read_id == "r1"
    np.testing.assert_array_equal(chunk.signal, [1.0, 2.0, 3.0])
    assert cl.unblock_read(3, 7) is None
    assert fake.unblocked == [(3, 7)]


def test_calibrate_fast5_u16_wrap():
    """read_buffer.cpp:239 loops `for (u16 raw : int_data)`: signed
    samples reinterpret as u16 before calibration."""
    raw = np.array([-3, 5], np.int16)
    out = calibrate_fast5(raw, digitisation=8192.0, range_=1402.0,
                          offset=10.0)
    want_m3 = np.float32(1402.0 * (65533.0 + 10.0) / 8192.0)
    want_5 = np.float32(1402.0 * (5.0 + 10.0) / 8192.0)
    np.testing.assert_allclose(out, [want_m3, want_5], rtol=0)
