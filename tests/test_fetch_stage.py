"""Fetcher stage unit tests: robots denial, 404s, politeness accounting,
url-range-pruned probes — driven directly (plain class, no Ray needed)."""

import pyarrow as pa
import pytest

from stimson_web_scraper_ray.sources.pages import pages_path_for
from stimson_web_scraper_ray.stages.fetch import Fetcher


@pytest.fixture(scope="module")
def pages_path():
    return pages_path_for("/root/testdata/sf0.001")


def _frontier_batch(urls, hosts=None, depths=None):
    hosts = hosts or [u.split("/")[2] for u in urls]
    depths = depths or [0] * len(urls)
    return pa.table({
        "url_canon": pa.array(urls, pa.string()),
        "host": pa.array(hosts, pa.string()),
        "depth": pa.array(depths, pa.int32()),
    })


def test_fetch_ok_denied_and_404(pages_path):
    import pyarrow.dataset as pads

    real_urls = pads.dataset(pages_path).to_table(
        columns=["url"])["url"].to_pylist()[:3]
    f = Fetcher(pages_path)
    batch = _frontier_batch(
        real_urls
        + ["http://news.bignews.com/private/secret.html"]   # robots-denied
        + ["http://news.bignews.com/2014/01/01/nope.html"]  # 404
    )
    out = f(batch)
    assert set(out["url"].to_pylist()) == set(real_urls)
    assert all(s == "200" for s in out["fetch_status"].to_pylist())
    assert f.pages_fetched == 3
    assert f.bytes_fetched > 0


def test_politeness_accounting(pages_path):
    import pyarrow.dataset as pads

    urls = pads.dataset(pages_path).to_table(
        columns=["url"])["url"].to_pylist()
    same_host = [u for u in urls if "bignews" in u][:5]
    f = Fetcher(pages_path, politeness_delay_s=1.0)
    f(_frontier_batch(same_host))
    # token bucket: 5 sequential requests to one host accrue 0+1+2+3+4
    assert f.total_wait == pytest.approx(10.0)
    host = same_host[0].split("/")[2]
    assert f.host_clock[host] == pytest.approx(5.0)


def test_depth_passthrough(pages_path):
    import pyarrow.dataset as pads

    real = pads.dataset(pages_path).to_table(
        columns=["url"])["url"].to_pylist()[:2]
    f = Fetcher(pages_path)
    out = f(_frontier_batch(real, depths=[3, 3]))
    assert out["depth"].to_pylist() == [3, 3]


def test_salt_hosts_spreads_heavy_host_uniformly():
    """Regression: `np.uint64 % python_int` promotes to float64 and zeroes
    the low hash bits — every salt came out 0 and a heavy host collapsed
    onto one part_key (one actor ran ~30% of a round serially)."""
    import pyarrow as pa

    from stimson_web_scraper_ray.functions.urlnorm import canon_hash64
    from stimson_web_scraper_ray.stages.url_stage import salt_hosts

    urls = [f"http://heavy.example.com/2014/01/01/s{i}.html"
            for i in range(1000)]
    t = pa.table({
        "url_canon": pa.array(urls),
        "url_hash": pa.array([canon_hash64(u) for u in urls], pa.uint64()),
        "host": pa.array(["heavy.example.com"] * 1000),
    })
    out = salt_hosts(t, {"heavy.example.com": 1000}, 16).to_pandas()
    sizes = out.groupby("part_key").size()
    assert len(sizes) == 16, f"expected 16 salt buckets, got {len(sizes)}"
    assert sizes.max() < 200, f"salting is lumpy: {sizes.tolist()}"


def test_robots_crawl_delay_overrides_default():
    """A robots Crawl-delay drives the per-host token bucket: hosts that
    publish one accumulate clock at that rate; hosts without keep the
    engine default."""
    from stimson_web_scraper_ray.stages.fetch import Fetcher, RobotsPolicy

    f = Fetcher.__new__(Fetcher)          # no parquet needed for the clock
    f.robots = RobotsPolicy()
    f.robots.cache["slow.com"] = RobotsPolicy.parse_body(
        "User-agent: *\nCrawl-delay: 2\n")
    f.delay = 0.5
    f.host_clock = {}
    f.total_wait = 0.0
    for _ in range(3):
        f._politeness_wait("slow.com")
        f._politeness_wait("fast.com")
    assert f.host_clock["slow.com"] == 6.0      # 3 × robots delay 2s
    assert f.host_clock["fast.com"] == 1.5      # 3 × default 0.5s
    assert f.total_wait == (0 + 2 + 4) + (0 + 0.5 + 1.0)
