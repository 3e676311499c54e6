from .terrain import (
    FlatTerrain,
    FourierTerrain,
    HeightmapTerrain,
    PlaneTerrain,
    Terrain,
)
