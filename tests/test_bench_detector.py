"""bench.py's external-CPU attribution detector — the burst signal the
benchmark's targeted re-measurement keys on. Pure /proc arithmetic, no
Spark: our own process subtree's work must never read as external
(that mis-classification is exactly what the r11 loadavg threshold got
wrong, flagging 85/144 queries on a quiet host), while a process
OUTSIDE the subtree must be counted."""

import os
import subprocess
import sys
import time

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


pytestmark = pytest.mark.skipif(
    bench._proc_snapshot() is None, reason="/proc attribution unavailable"
)


def _ext(window):
    s0 = bench._proc_snapshot()
    time.sleep(window)
    return bench._external_cores(s0, bench._proc_snapshot(), window)


def test_own_child_burn_is_not_external():
    """A CPU burn in our OWN subtree must be fully attributed to us:
    external during the burn stays within noise of ambient. Retried
    like test_reaped_child_cpu_stays_attributed — a real attribution
    bug leaks ~3 cores every attempt; an external burst between the
    two windows is transient (the driver's -x must not abort on one)."""
    last = None
    for _ in range(3):
        ambient = _ext(0.6)
        kids = [
            subprocess.Popen([sys.executable, "-c", "while True: pass"])
            for _ in range(3)
        ]
        try:
            time.sleep(0.2)
            during = _ext(1.0)
        finally:
            for c in kids:
                c.kill()
            for c in kids:
                c.wait()
        if during <= ambient + 1.0:
            return
        last = (ambient, during)
    raise AssertionError(
        f"own 3-core burn leaked into external in 3/3 attempts: "
        f"ambient={last[0]:.2f} during={last[1]:.2f}"
    )


def test_reaped_child_cpu_stays_attributed():
    """A subtree child that exits MID-window moves its jiffies into its
    reaper's cutime — the subtree delta must not lose (or double-count)
    them, so external still reads ~ambient. A real mis-attribution
    fails EVERY attempt (the child's ~0.5 core always leaks), while an
    external burst rising between the ambient and during windows is
    transient — so retry up to 3 times before declaring the bug (the
    driver runs pytest with -x; one burst must not abort the suite —
    observed flaking under a concurrent full-suite load, r14)."""
    last = None
    for _ in range(3):
        ambient = _ext(0.6)
        child = subprocess.Popen(
            [
                sys.executable,
                "-c",
                "import time\nt=time.time()\nwhile time.time()-t < 0.5: pass",
            ]
        )
        s0 = bench._proc_snapshot()
        child.wait()  # burns ~0.5 s then is reaped inside the window
        time.sleep(0.5)
        during = bench._external_cores(s0, bench._proc_snapshot(), 1.0)
        if during <= ambient + 0.8:
            return
        last = (ambient, during)
    raise AssertionError(
        f"reaped child mis-attributed in 3/3 attempts: "
        f"ambient={last[0]:.2f} during={last[1]:.2f}"
    )


def test_detached_external_burn_is_counted():
    """A double-forked process reparented away from our subtree is a
    genuine external load and must register ~1 core."""
    p = subprocess.Popen(
        [
            sys.executable,
            "-c",
            (
                "import os, time\n"
                "if os.fork() == 0:\n"
                "    os.setsid()\n"
                "    if os.fork() == 0:\n"
                "        t = time.time()\n"
                "        while time.time() - t < 3: pass\n"
                "    os._exit(0)\n"
                "os._exit(0)"
            ),
        ]
    )
    p.wait()
    time.sleep(0.4)  # let the orphan reparent and spin up
    during = _ext(1.2)
    assert during >= 0.6, f"external 1-core burn read {during:.2f} cores"


class _FakeDF:
    class _W:
        def mode(self, _):
            return self

        def format(self, _):
            return self

        def save(self):
            pass

    @property
    def write(self):
        return self._W()


def test_failed_repass_keeps_contaminated_hot_annotation():
    """A query requeued because its only timing was burst-contaminated
    must KEEP its hot annotation when the re-measure run FAILS — the
    JSON would otherwise report the inflated min as clean (r11 advice).
    A query that fails before ANY timing still clears (the -1 sentinel
    is not a contaminated measurement)."""
    timings = {"q": 3.2}  # prior successful-but-contaminated min
    hot = {"q"}

    def boom(_spark, _sf):
        raise RuntimeError("re-measure failed")

    bench._measure("q", boom, 1, None, "/nowhere", 2.0, timings, hot, {})
    assert "q" in hot and timings["q"] == 3.2
    # never-succeeded query: sentinel recorded, hot cleared
    timings2, hot2 = {}, set()
    bench._measure("r", boom, 1, None, "/nowhere", 2.0, timings2, hot2, {})
    assert timings2["r"] == -1.0 and "r" not in hot2
    # a clean successful run still clears hot, records the timing, and
    # records the first-ever run in the cold dict (r14); a later run
    # must NOT overwrite the cold number
    timings3, hot3, cold3 = {}, set(), {}
    bench._measure(
        "s", lambda *_: _FakeDF(), 1, None, "/nowhere", 1e9, timings3, hot3,
        cold3,
    )
    assert timings3["s"] >= 0 and "s" not in hot3
    first = cold3["s"]
    bench._measure(
        "s", lambda *_: _FakeDF(), 1, None, "/nowhere", 1e9, timings3, hot3,
        cold3,
    )
    assert cold3["s"] == first


def test_snapshot_fields_parse_sanely():
    busy, procs = bench._proc_snapshot()
    assert busy > 0 and os.getpid() in procs
    ppid, jiff = procs[os.getpid()]
    assert ppid > 0 and jiff >= 0
    assert bench._subtree_jiffies(procs) >= jiff
