// Stub replacing the vendored fast5/hdf5 headers: the golden rig feeds raw
// signal directly, so the HDF5 ReadBuffer constructor is never invoked.
#ifndef MINI_HDF5_TOOLS_HPP
#define MINI_HDF5_TOOLS_HPP
#include <cstdlib>
#include <fstream>
#include <iostream>
#include <map>
#include <string>
#include <vector>

namespace hdf5_tools {
class File {
  public:
    std::map<std::string, std::string> get_attr_map(const std::string&) const {
        abort();
    }
    template <typename T>
    void read(const std::string&, std::vector<T>&) const {
        abort();
    }
};
}  // namespace hdf5_tools
#endif
