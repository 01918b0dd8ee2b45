#pragma once
// include-only in the reference (the prefix sum is hand-vectorized)
