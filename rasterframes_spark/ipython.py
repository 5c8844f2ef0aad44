"""Notebook display helpers (reference: python/pyrasterframes/rf_ipython.py).

The reference renders tiles through matplotlib and delegates DataFrame
markdown/HTML to the JVM (`rf_ipython.py:33-240`); this engine renders
everything pure-python — percentile-normalized tiles through the own PNG
encoder + color ramps, DataFrames straight from collected rows — so the
helpers work in any kernel with zero extra dependencies.  Importing the
module never requires IPython; :func:`register_formatters` hooks the rich
reprs only when IPython is actually present.
"""

from __future__ import annotations

import base64
import html as _html

import numpy as np

from rasterframes_spark.tile import Tile

__all__ = [
    "tile_to_png", "tile_to_html", "binary_to_html",
    "pandas_df_to_html", "spark_df_to_markdown", "spark_df_to_html",
    "register_formatters",
]

_PNG_HEADER = b"\x89PNG\r\n\x1a\n"


def tile_to_png(tile: Tile, lower_percentile: float = 1.0,
                upper_percentile: float = 99.0,
                ramp: str = "viridis") -> bytes | None:
    """Tile -> PNG bytes, normalized between the given data percentiles
    (the reference's plot_tile contract, `rf_ipython.py:33-88`) and
    mapped through a color ramp. NoData cells render as ramp entry 0
    (fully-NoData tiles as a uniform entry-0 image)."""
    if tile is None or tile.cells is None:
        return None
    if not upper_percentile > lower_percentile:
        raise ValueError(
            f"invalid percentiles {lower_percentile}, {upper_percentile}")
    from rasterframes_spark.functions.proj_raster import _ramp_lut
    from rasterframes_spark.sources.png import encode_png

    a = tile.masked().astype("float64")
    data = np.asarray(a.filled(np.nan))
    if not np.isfinite(data).any():
        # fully-NoData tile: uniform ramp-entry-0 image (an all-NaN
        # percentile would otherwise cast NaN to uint8 — undefined)
        idx = np.zeros(data.shape, dtype="uint8")
        return encode_png(_ramp_lut(ramp)[idx])
    lo = float(np.nanpercentile(data, lower_percentile))
    hi = float(np.nanpercentile(data, upper_percentile))
    span = (hi - lo) or 1.0
    idx = np.clip((np.nan_to_num(data, nan=lo) - lo) / span * 255.0,
                  0, 255).astype("uint8")
    return encode_png(_ramp_lut(ramp)[idx])


def tile_to_html(tile: Tile, width: int | None = None, **png_kwargs) -> str:
    """Tile -> inline ``<img>`` (base64 data URI), the Jupyter cell repr."""
    png = tile_to_png(tile, **png_kwargs)
    if png is None:
        return "<em>empty tile</em>"
    b64 = base64.b64encode(png).decode("ascii")
    w = f' width="{int(width)}"' if width else ""
    return f'<img src="data:image/png;base64,{b64}"{w} />'


def binary_to_html(blob) -> str | bytes:
    """PNG byte strings (e.g. rf_render_png output) become inline images;
    anything else passes through (`rf_ipython.py:143-154`)."""
    if isinstance(blob, (bytes, bytearray)) and bytes(blob[:8]) == _PNG_HEADER:
        b64 = base64.b64encode(bytes(blob)).decode("ascii")
        return f'<img src="data:image/png;base64,{b64}" />'
    return blob


def _cell_html(v, max_width: int = 64) -> str:
    if isinstance(v, Tile):
        return tile_to_html(v, width=max_width)
    if isinstance(v, (bytes, bytearray)):
        out = binary_to_html(v)
        if isinstance(out, str):
            return out
        return f"&lt;{len(v)} bytes&gt;"
    if hasattr(v, "wkt"):  # geometry-like
        w = str(v.wkt)
        if len(w) > max_width:
            w = w[:max_width - 3] + "..."
        return _html.escape(w)
    if v is None:
        return ""
    s = str(v)
    if len(s) > max_width:
        s = s[:max_width - 3] + "..."
    # corpus text is untrusted — escape before it reaches the notebook DOM
    return _html.escape(s)


def _df_rows(df, num_rows: int):
    """(columns, rendered rows) for either a Spark or pandas DataFrame;
    tile structs from Spark decode to Tile objects for image rendering."""
    try:
        import pandas as pd
        if isinstance(df, pd.DataFrame):
            return list(df.columns), [
                list(r) for _, r in df.head(num_rows).iterrows()]
    except ImportError:  # pragma: no cover
        pass
    rows = df.limit(num_rows).collect()
    cols = df.columns
    tile_fields = {
        f.name for f in df.schema.fields
        if "cell_type" in str(f.dataType) and "cells" in str(f.dataType)}
    out = []
    for r in rows:
        vals = []
        for c in cols:
            v = r[c]
            if c in tile_fields and v is not None and v["cells"] is not None:
                v = Tile.from_parts(v["cell_type"], v["cols"], v["rows"],
                                    bytes(v["cells"]))
            vals.append(v)
        out.append(vals)
    return cols, out


def spark_df_to_html(df, num_rows: int = 5, truncate: bool = False) -> str:
    """DataFrame -> HTML table with tiles as inline images
    (`rf_ipython.py:234-238`, computed locally instead of via the JVM)."""
    cols, rows = _df_rows(df, num_rows)
    w = 24 if truncate else 64
    head = "".join(f"<th>{_html.escape(str(c))}</th>" for c in cols)
    body = "".join(
        "<tr>" + "".join(f"<td>{_cell_html(v, w)}</td>" for v in r) + "</tr>"
        for r in rows)
    return f"<table><tr>{head}</tr>{body}</table>"


def spark_df_to_markdown(df, num_rows: int = 5, truncate: bool = False) -> str:
    """DataFrame -> GitHub-flavored markdown table; tiles render as their
    dimensions + cell type (`rf_ipython.py:228-231`)."""
    cols, rows = _df_rows(df, num_rows)
    w = 24 if truncate else 64

    def md(v):
        if isinstance(v, Tile):
            return f"Tile({v.cols}x{v.rows}, {v.cell_type.name})"
        s = _cell_html(v, w)
        # newlines would terminate the markdown table row mid-cell
        return s.replace("|", "\\|").replace("\n", " ")

    lines = ["| " + " | ".join(cols) + " |",
             "| " + " | ".join("---" for _ in cols) + " |"]
    lines += ["| " + " | ".join(md(v) for v in r) + " |" for r in rows]
    return "\n".join(lines)


def pandas_df_to_html(df) -> str | None:
    """HTML repr for pandas frames holding Tile objects
    (`rf_ipython.py:157-225`); plain frames keep pandas' native repr
    (index, dtype-aware formatting) untouched."""
    import pandas as pd

    if not pd.get_option("display.notebook_repr_html"):
        return None
    if len(df) == 0 or not any(
            isinstance(df.iloc[0][c], (Tile, bytes, bytearray))
            for c in df.columns):
        return df._repr_html_()
    return spark_df_to_html(df, num_rows=pd.get_option("display.max_rows")
                            or 20)


def register_formatters() -> bool:
    """Install rich reprs into an active IPython session (no-op, returns
    False, when IPython is absent). Tiles display as images; Spark
    DataFrames as HTML tables with inline tiles."""
    try:
        from IPython import get_ipython
    except ImportError:
        return False
    ip = get_ipython()
    if ip is None:
        return False
    fmts = ip.display_formatter.formatters
    fmts["image/png"].for_type(Tile, tile_to_png)
    html = fmts["text/html"]
    md = fmts["text/markdown"]
    html.for_type(Tile, tile_to_html)
    md.for_type(Tile, tile_to_html)
    try:
        from pyspark.sql import DataFrame
        html.for_type(DataFrame, spark_df_to_html)
        md.for_type(DataFrame, spark_df_to_markdown)
    except ImportError:  # pragma: no cover
        pass
    try:
        import pandas as pd
        html.for_type(pd.DataFrame, pandas_df_to_html)
    except ImportError:  # pragma: no cover
        pass
    return True


# Reference parity: importing the module inside a live IPython session
# registers the rich reprs (`rf_ipython.py:250-280` does the same at
# import); outside IPython this is a silent no-op.
register_formatters()
