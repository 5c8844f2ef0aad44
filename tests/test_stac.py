"""STAC source: static ItemCollection reads + live API search against a
local mock /search endpoint (POST, bbox/datetime/collections filters,
next-link pagination) chaining into the raster catalog."""

import http.server
import json
import threading

import numpy as np
import pytest

from rasterframes_spark import sources as S
from rasterframes_spark.sources import geotiff as GT


def _item(i, coll, x0, dt, href):
    return {
        "type": "Feature", "id": f"item-{i}", "collection": coll,
        "bbox": [x0, 0.0, x0 + 1.0, 1.0],
        "geometry": {"type": "Polygon", "coordinates": [
            [[x0, 0], [x0 + 1, 0], [x0 + 1, 1], [x0, 1], [x0, 0]]]},
        "properties": {"datetime": dt},
        "assets": {"B1": {"href": href, "type": "image/tiff"}},
    }


@pytest.fixture(scope="module")
def stac_server(tmp_path_factory):
    d = tmp_path_factory.mktemp("assets")
    arr = (np.arange(32 * 32, dtype="int64") % 100 + 1).astype("uint16").reshape(32, 32)
    tif = str(d / "b1.tiff")
    with open(tif, "wb") as f:
        f.write(GT.write_geotiff(arr, (0, 0, 1, 1), crs="EPSG:4326", nodata=0))

    all_items = [
        _item(0, "landsat", 0.0, "2024-06-01T00:00:00Z", tif),
        _item(1, "landsat", 10.0, "2024-06-02T00:00:00Z", tif),
        _item(2, "landsat", 0.5, "2023-01-01T00:00:00Z", tif),
        _item(3, "sentinel", 0.2, "2024-06-03T00:00:00Z", tif),
    ]
    requests = []

    class Handler(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_POST(self):
            n = int(self.headers.get("Content-Length") or 0)
            body = json.loads(self.rfile.read(n) or b"{}")
            requests.append(body)
            items = all_items
            if body.get("collections"):
                items = [it for it in items if it["collection"] in body["collections"]]
            if body.get("bbox"):
                xmin, ymin, xmax, ymax = body["bbox"]
                items = [it for it in items
                         if it["bbox"][0] <= xmax and it["bbox"][2] >= xmin
                         and it["bbox"][1] <= ymax and it["bbox"][3] >= ymin]
            if body.get("datetime"):
                lo, hi = body["datetime"].split("/")
                items = [it for it in items
                         if lo <= it["properties"]["datetime"] <= hi]
            # one-item pages to exercise next-link pagination
            page = int(body.get("page") or 1)
            start = (page - 1) * 1
            feats = items[start:start + 1]
            doc = {"type": "FeatureCollection", "features": feats, "links": []}
            if start + 1 < len(items):
                doc["links"].append({
                    "rel": "next", "href": f"http://127.0.0.1:{port}/search",
                    "method": "POST", "body": {"page": page + 1}})
            payload = json.dumps(doc).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/geo+json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{port}", requests, tif, arr
    srv.shutdown()


def test_stac_api_search_filters_and_pagination(spark, stac_server):
    url, requests, tif, _ = stac_server
    items = S.stac_api_search(
        spark, url, bbox=(0.0, 0.0, 2.0, 2.0),
        datetime_range=("2024-01-01T00:00:00Z", "2024-12-31T00:00:00Z"),
        collections=["landsat"], limit=1)
    rows = items.collect()
    # item-0 only: item-1 fails bbox, item-2 fails datetime, item-3 collection
    assert [r["id"] for r in rows] == ["item-0"]
    assert rows[0]["assets"]["B1"] == tif
    # the filters went over the wire, not client-side
    assert requests[0]["bbox"] == [0.0, 0.0, 2.0, 2.0]
    assert requests[0]["collections"] == ["landsat"]


def test_stac_api_pagination_multi(spark, stac_server):
    url, requests, _, _ = stac_server
    items = S.stac_api_search(spark, url, collections=["landsat"])
    assert sorted(r["id"] for r in items.collect()) == ["item-0", "item-1", "item-2"]


def test_stac_search_chains_into_read_raster(spark, stac_server):
    url, _, tif, arr = stac_server
    items = S.stac_api_search(spark, url, collections=["sentinel"])
    cat = S.stac_asset_catalog(items, ["B1"])
    df = S.read_raster(spark, cat.select("B1_path"), catalog_col="B1_path",
                       tile_dimensions=(32, 32))
    import rasterframes_spark as rf
    total = df.select(S.realize_tiles("tile_ref").alias("t")).agg(
        rf.rf_agg_stats("t").alias("s")).head()["s"]
    assert total["data_cells"] == int((arr != 0).sum())
