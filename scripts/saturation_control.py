"""Host-saturation control for the 8->32 scaling number (BASELINE.md).

Runs an ENGINE-FREE workload — stdlib html.parser parsing of a fixed
synthetic page, the same allocation profile as any DOM build, zero Ray,
zero shared state, zero engine code — across N worker PROCESSES and
reports per-worker and aggregate throughput. If per-worker throughput
decays as N grows on idle cores, the decay is a property of the HOST
(allocator/memory bandwidth, shared LLC), not of the engine's
partitioning — which is the claim BASELINE.md makes about the sub-0.8
8->32 efficiency.

Usage: python scripts/saturation_control.py [N ...]   (default 1 6 8 16 27 32)
Prints one JSON line per N.
"""

import json
import multiprocessing as mp
import sys
import time

PAGE = (
    "<html><head><title>t</title></head><body>"
    + "".join(
        f'<div class="c{i}"><p>para {i} text <a href="/x{i}">link</a>'
        f" tail</p><span>s</span></div>"
        for i in range(120)
    )
    + "</body></html>"
)

DURATION = 6.0


def single_rate(duration: float = 1.5) -> float:
    """Single-threaded control rate (pages/s) — the in-process form used
    by bench.py to stamp every BENCH JSON with a same-minute host-speed
    calibration (this shared host drifts 20-45% between minutes)."""
    from html.parser import HTMLParser

    class Collect(HTMLParser):
        def __init__(self):
            super().__init__(convert_charrefs=True)
            self.nodes = []

        def handle_starttag(self, tag, attrs):
            self.nodes.append({"tag": tag, "attrib": dict(attrs),
                               "children": []})

        def handle_data(self, data):
            if self.nodes:
                self.nodes[-1]["children"].append(data)

    t_end = time.time() + duration
    n = 0
    while time.time() < t_end:
        p = Collect()
        p.feed(PAGE)
        p.close()
        n += 1
    return round(n / duration, 1)


def worker(out_q):
    from html.parser import HTMLParser

    class Collect(HTMLParser):
        def __init__(self):
            super().__init__(convert_charrefs=True)
            self.nodes = []

        def handle_starttag(self, tag, attrs):
            # allocate like a DOM build: node dict + attr dict + list
            self.nodes.append({"tag": tag, "attrib": dict(attrs),
                               "children": []})

        def handle_data(self, data):
            if self.nodes:
                self.nodes[-1]["children"].append(data)

    t_end = time.time() + DURATION
    n = 0
    while time.time() < t_end:
        p = Collect()
        p.feed(PAGE)
        p.close()
        n += 1
    out_q.put(n)


def run(n_workers: int) -> dict:
    q = mp.Queue()
    procs = [mp.Process(target=worker, args=(q,)) for _ in range(n_workers)]
    t0 = time.time()
    for p in procs:
        p.start()
    counts = [q.get() for _ in procs]
    for p in procs:
        p.join()
    wall = time.time() - t0
    total = sum(counts)
    return {
        "workers": n_workers,
        "pages_total": total,
        "pages_per_sec": round(total / DURATION, 1),
        "pages_per_sec_per_worker": round(total / DURATION / n_workers, 1),
        "wall": round(wall, 2),
    }


if __name__ == "__main__":
    levels = [int(x) for x in sys.argv[1:]] or [1, 6, 8, 16, 27, 32]
    base = None
    for n in levels:
        r = run(n)
        if base is None:
            base = r["pages_per_sec_per_worker"]
        r["per_worker_vs_1x"] = round(r["pages_per_sec_per_worker"] / base, 3)
        print(json.dumps(r))
