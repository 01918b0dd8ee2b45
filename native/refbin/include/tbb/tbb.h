#pragma once
#include "blocked_range.h"
#include "concurrent_vector.h"
#include "mutex.h"
#include "parallel_for_each.h"
#include "parallel_sort.h"
#include "scalable_allocator.h"
