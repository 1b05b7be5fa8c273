"""Hardware sampling server: asyncio unix-socket service.

Parity with /root/reference/src/tcn/hws/server.py:35-151 (START spawns a
sampling coroutine, DUMP writes npz/json, TICK marks indices, STOP exits),
with the NVML reads replaced by what a TPU host exposes:

  cpu_exe_utl   psutil.cpu_percent
  cpu_psu       idle + utilization * (tdp - idle)   [reference's model]
  host_mem      psutil.virtual_memory().percent
  tpu_mem       jax device memory_stats()['bytes_in_use'] (0 if N/A)
  tpu_busy      MEASURED queue-probe duty estimate: a 1-element device op
                is dispatched and timed; when the chip is executing other
                work the probe queues behind it, so its completion
                latency rises above the calibrated idle baseline.  The
                series genuinely dips to ~0 when the chip idles (gated in
                tests/test_harness.py), unlike the round-3 bytes-in-use
                boolean.  Post-hoc, hws.xprof_util derives the exact duty
                cycle from profiler traces (device-interval union).
  tpu_psu       idle + tpu_busy * (tdp - idle) power envelope
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

FIELDS = ("tpu_psu", "tpu_mem_mb", "tpu_busy", "cpu_exe_utl", "cpu_psu",
          "host_mem_pct")


class Sampler:
    def __init__(self, rate_s: float = C.DEFAULT_SAMPLE_RATE_S):
        self.rate_s = rate_s
        self.data: Dict[str, List[float]] = {k: [] for k in FIELDS}
        self.ticks: List[int] = []
        self.running = False
        self._devices = None
        self._probe = None        # (fn, arg) tiny compiled device op
        self._idle_lat = None     # calibrated idle probe latency [s]

    def _setup_probe(self) -> bool:
        if self._probe is not None:
            return self._idle_lat is not None
        try:
            import jax
            import jax.numpy as jnp

            if self._devices is None:
                self._devices = jax.local_devices()
            dev = self._devices[0]
            x = jax.device_put(jnp.ones((8,), jnp.float32), dev)
            fn = jax.jit(lambda a: a + 1.0)
            fn(x).block_until_ready()   # compile
            self._probe = (fn, x)
            # calibrate idle latency (median of 5)
            lats = []
            for _ in range(5):
                t0 = time.perf_counter()
                fn(x).block_until_ready()
                lats.append(time.perf_counter() - t0)
            lats.sort()
            self._idle_lat = lats[len(lats) // 2]
            return True
        except Exception:
            self._probe = (None, None)
            self._idle_lat = None
            return False

    def _tpu_busy(self) -> float:
        """Queue-probe duty estimate in [0, 1]: the probe op completes
        only after in-flight device work; excess latency over the idle
        baseline, normalized by the sampling interval, approximates the
        busy fraction seen by this sample."""
        if not self._setup_probe():
            return 0.0
        fn, x = self._probe
        t0 = time.perf_counter()
        fn(x).block_until_ready()
        lat = time.perf_counter() - t0
        excess = max(0.0, lat - 2.0 * self._idle_lat)
        return min(1.0, excess / max(self.rate_s, 4.0 * self._idle_lat))

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
        tpu_busy = self._tpu_busy()
        tpu_psu = C.TPU_SPEC["idle_w"] + tpu_busy * (
            C.TPU_SPEC["tdp_w"] - C.TPU_SPEC["idle_w"])
        row = (tpu_psu, tpu_mem, tpu_busy, cpu, cpu_psu, mem)
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
