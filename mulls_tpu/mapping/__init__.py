from mulls_tpu.mapping.local_map import LocalMap, init_local_map, update_local_map

__all__ = ["LocalMap", "init_local_map", "update_local_map"]
