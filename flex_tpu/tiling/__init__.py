from flex_tpu.tiling.stats import TileStats, tile_stats, data_volume_est

__all__ = ["TileStats", "tile_stats", "data_volume_est"]
