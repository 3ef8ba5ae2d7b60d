// stub replacing vendored fast5 header (supplies transitive std includes)
#ifndef MINI_FAST5_HPP
#define MINI_FAST5_HPP
#include <deque>
#include <vector>
#include <string>
#include <map>
#include <set>
#include <array>
#include <mutex>
#include <unordered_set>
#include <fstream>
#include <iostream>
#include <cmath>
#include <cstring>
#endif
