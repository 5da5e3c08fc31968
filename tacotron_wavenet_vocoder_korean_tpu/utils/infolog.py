"""Timestamped stdout + file logging with optional Slack webhook mirror
(reference: utils/infolog.py:14-50)."""
from __future__ import annotations

import atexit
import json
import urllib.request
from datetime import datetime
from typing import Optional

_format = "%Y-%m-%d %H:%M:%S.%f"
_file = None
_run_name = None
_slack_url = None


def init(filename: str, run_name: str, slack_url: Optional[str] = None) -> None:
    global _file, _run_name, _slack_url
    close()
    _file = open(filename, "a", encoding="utf-8")
    _file.write("\n-----------------------------------------------------------------\n")
    _file.write(f"Starting new training run\n")
    _file.write("-----------------------------------------------------------------\n")
    _run_name = run_name
    _slack_url = slack_url


def log(msg: str, slack: bool = False) -> None:
    print(msg, flush=True)
    if _file is not None:
        _file.write(f"[{datetime.now().strftime(_format)[:-3]}]  {msg}\n")
        _file.flush()
    if slack and _slack_url is not None:
        _send_slack(msg)


def _send_slack(msg: str) -> None:
    try:
        req = urllib.request.Request(
            _slack_url,
            data=json.dumps({
                "username": f"tacotron-tpu ({_run_name})",
                "icon_emoji": ":taco:",
                "text": msg,
            }).encode("utf-8"),
            headers={"Content-Type": "application/json"})
        urllib.request.urlopen(req, timeout=5)
    except Exception as e:  # logging must never kill training
        print(f"(slack notification failed: {e})")


def close() -> None:
    global _file
    if _file is not None:
        _file.close()
        _file = None


atexit.register(close)


class ValueWindow:
    """Moving average over the last n values (reference utils/__init__.py:17-37)."""

    def __init__(self, window_size: int = 100):
        self._window_size = window_size
        self._values = []

    def append(self, x: float) -> None:
        self._values = self._values[-(self._window_size - 1):] + [float(x)]

    @property
    def sum(self) -> float:
        return sum(self._values)

    @property
    def count(self) -> int:
        return len(self._values)

    @property
    def average(self) -> float:
        return self.sum / max(1, self.count)

    def reset(self) -> None:
        self._values = []
