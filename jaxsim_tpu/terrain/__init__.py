from .terrain import FlatTerrain, HeightmapTerrain, PlaneTerrain, Terrain
