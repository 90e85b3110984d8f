from .gsplat import RasterizeSettings, rasterize  # noqa: F401
