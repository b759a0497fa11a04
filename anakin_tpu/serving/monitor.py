"""Device monitor: background sampling of device/process health.

Parity with the reference's service Monitor
(`framework/service/monitor.h:25-78`, `device_info.h:99-180`): a background
thread polls device name / memory every N seconds and the latest snapshot
is attached to every RPC response (`service.proto` DeviceStatus).  TPUs
expose memory via PJRT `memory_stats`; temperature has no PJRT surface, so
the snapshot carries what the platform provides.
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass
from typing import Dict, Optional

import jax

__all__ = ["DeviceMonitor", "DeviceStatus"]


@dataclass
class DeviceStatus:
    device: str = "unknown"
    platform: str = "unknown"
    bytes_in_use: int = -1
    bytes_limit: int = -1
    peak_bytes_in_use: int = -1
    sampled_at: float = 0.0

    def to_dict(self) -> Dict:
        return self.__dict__.copy()


def _sample() -> DeviceStatus:
    dev = jax.devices()[0]
    st = DeviceStatus(device=str(dev), platform=dev.platform,
                      sampled_at=time.time())
    try:
        ms = dev.memory_stats() or {}
        st.bytes_in_use = int(ms.get("bytes_in_use", -1))
        st.bytes_limit = int(ms.get("bytes_limit", -1))
        st.peak_bytes_in_use = int(ms.get("peak_bytes_in_use", -1))
    except Exception:
        pass
    return st


class DeviceMonitor:
    def __init__(self, interval_s: float = 5.0):
        self.interval_s = interval_s
        self._status = _sample()
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    def start(self) -> "DeviceMonitor":
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        return self

    def _loop(self) -> None:
        while not self._stop.wait(self.interval_s):
            self._status = _sample()

    def status(self) -> DeviceStatus:
        return self._status

    def stop(self) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=2)
