"""Hardware sampling server: asyncio unix-socket service.

Parity with /root/reference/src/tcn/hws/server.py:35-151 (START spawns a
sampling coroutine, DUMP writes npz/json, TICK marks indices, STOP exits),
with the NVML reads replaced by what a TPU host exposes:

  cpu_exe_utl   psutil.cpu_percent
  cpu_psu       idle + utilization * (tdp - idle)   [reference's model]
  host_mem      psutil.virtual_memory().percent
  tpu_mem       jax device memory_stats()['bytes_in_use'] (0 if N/A)
  tpu_psu       duty-cycle * TDP model (duty from bytes_in_use delta proxy
                is meaningless, so we record the nameplate envelope and the
                sampler's job is the *time series shape*; real per-chip
                power needs platform counters unavailable in this runtime)
"""
from __future__ import annotations

import asyncio
import json
import os
import time
from typing import Dict, List

import numpy as np
import psutil

from . import constants as C

FIELDS = ("tpu_psu", "tpu_mem_mb", "cpu_exe_utl", "cpu_psu", "host_mem_pct")


class Sampler:
    def __init__(self, rate_s: float = C.DEFAULT_SAMPLE_RATE_S):
        self.rate_s = rate_s
        self.data: Dict[str, List[float]] = {k: [] for k in FIELDS}
        self.ticks: List[int] = []
        self.running = False
        self._devices = None

    def _tpu_mem_mb(self) -> float:
        try:
            import jax

            if self._devices is None:
                self._devices = jax.local_devices()
            stats = self._devices[0].memory_stats()
            if stats and "bytes_in_use" in stats:
                return stats["bytes_in_use"] / 1e6
        except Exception:
            pass
        return 0.0

    def sample_once(self) -> None:
        cpu = psutil.cpu_percent(interval=None)
        cpu_psu = C.CPU_SPEC["idle_w"] + cpu / 100.0 * (
            C.CPU_SPEC["tdp_w"] - C.CPU_SPEC["idle_w"])
        mem = psutil.virtual_memory().percent
        tpu_mem = self._tpu_mem_mb()
        tpu_busy = 1.0 if tpu_mem > 1.0 else 0.0
        tpu_psu = C.TPU_SPEC["idle_w"] + tpu_busy * (
            C.TPU_SPEC["tdp_w"] - C.TPU_SPEC["idle_w"])
        row = (tpu_psu, tpu_mem, cpu, cpu_psu, mem)
        for k, v in zip(FIELDS, row):
            self.data[k].append(v)

    async def run(self) -> None:
        self.running = True
        while self.running:
            self.sample_once()
            await asyncio.sleep(self.rate_s)

    def tick(self) -> None:
        self.ticks.append(len(self.data[FIELDS[0]]))

    def dump(self, directory: str = ".") -> str:
        os.makedirs(directory, exist_ok=True)
        if C.DUMP_FORMAT == "json":
            path = os.path.join(directory, "hws_dump.json")
            with open(path, "w") as f:
                json.dump({"data": self.data, "ticks": self.ticks,
                           "rate_s": self.rate_s}, f)
        else:
            path = os.path.join(directory, "hws_dump.npz")
            np.savez_compressed(
                path,
                ticks=np.asarray(self.ticks),
                rate_s=np.asarray([self.rate_s]),
                **{k: np.asarray(v) for k, v in self.data.items()})
        return path


async def main(socket_dir: str | None = None,
               rate_s: float = C.DEFAULT_SAMPLE_RATE_S,
               dump_dir: str = ".") -> None:
    sampler = Sampler(rate_s)
    task: asyncio.Task | None = None
    stop_event = asyncio.Event()

    async def handle(reader: asyncio.StreamReader,
                     writer: asyncio.StreamWriter) -> None:
        nonlocal task
        raw = await reader.read(4096)
        try:
            order = json.loads(raw.decode()).get("order")
        except Exception:
            order = None
        reply = {"status": "ok", "order": order}
        if order == C.ORDER_START:
            if task is None:
                task = asyncio.get_event_loop().create_task(sampler.run())
        elif order == C.ORDER_TICK:
            sampler.tick()
        elif order == C.ORDER_DUMP:
            reply["path"] = sampler.dump(dump_dir)
        elif order == C.ORDER_STOP:
            sampler.running = False
            if task is not None:
                await asyncio.sleep(0)
            stop_event.set()
        else:
            reply["status"] = "unknown-order"
        writer.write(json.dumps(reply).encode())
        await writer.drain()
        writer.close()

    sdir = socket_dir or C.SOCKET_DIRECTORY
    os.makedirs(sdir, exist_ok=True)
    path = C.socket_path(sdir)
    if os.path.exists(path):
        os.unlink(path)
    server = await asyncio.start_unix_server(handle, path=path)
    async with server:
        await stop_event.wait()
    if os.path.exists(path):
        os.unlink(path)


def cli(socket_dir: str | None = None,
        rate_s: float = C.DEFAULT_SAMPLE_RATE_S, dump_dir: str = ".") -> None:
    asyncio.run(main(socket_dir, rate_s, dump_dir))
