from .jacobi import jacobi, block_jacobi, extract_blocks_from_local
