"""Geometry tier.

quadkey  — pure Web-Mercator quadkey arithmetic (no geo lib). Tiles in the
           reference ARE zoom-N quadkeys (reference custom_data/README.md:227-245),
           so 'tile intersects polygon' reduces to an exact equi-join against
           the polygon's quadkey cover: the engine's hot spatial join becomes
           a broadcast hash join Catalyst fully understands.
wkt      — dependency-free WKT parse/emit + planar geometry kernel
           (point-in-polygon, rect clip area, segment intersection) used by
           the pandas-UDF spatial tier for the small-side joins
           (facility-vs-envelope, admin assignment, landfall).
sjoin    — the Spark-side spatial join strategies built on the two above.
"""

from aos_spark.geo import quadkey, wkt  # noqa: F401
