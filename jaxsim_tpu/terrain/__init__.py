from .terrain import FlatTerrain, PlaneTerrain, Terrain
