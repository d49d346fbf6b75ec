from . import (bresenham, correlation, filters, icp, kabsch, nn, pallas_nn,  # noqa: F401
               scan, voxel)
