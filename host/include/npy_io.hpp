// Minimal .npy (NumPy format v1.0) float32 reader/writer — just enough
// for the native deploy runners to exchange tensors with the Python
// exporter (tools/export_native_consumable.py). C-order, '<f4' only.
#pragma once

#include <cstdint>
#include <cstring>
#include <fstream>
#include <stdexcept>
#include <string>
#include <vector>

namespace avp {

struct NpyArray {
  std::vector<int64_t> shape;
  std::vector<float> data;
  int64_t size() const {
    int64_t n = 1;
    for (auto d : shape) n *= d;
    return n;
  }
};

inline NpyArray read_npy_f32(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) throw std::runtime_error("cannot open " + path);
  char magic[6];
  f.read(magic, 6);
  if (std::memcmp(magic, "\x93NUMPY", 6) != 0)
    throw std::runtime_error(path + ": not a .npy file");
  uint8_t ver[2];
  f.read(reinterpret_cast<char*>(ver), 2);
  uint32_t hlen = 0;
  if (ver[0] == 1) {
    uint16_t h16;
    f.read(reinterpret_cast<char*>(&h16), 2);
    hlen = h16;
  } else {
    f.read(reinterpret_cast<char*>(&hlen), 4);
  }
  std::string header(hlen, '\0');
  f.read(header.data(), hlen);
  if (header.find("'<f4'") == std::string::npos)
    throw std::runtime_error(path + ": dtype is not '<f4'");
  if (header.find("'fortran_order': False") == std::string::npos)
    throw std::runtime_error(path + ": fortran order unsupported");
  auto sp = header.find("'shape': (");
  if (sp == std::string::npos)
    throw std::runtime_error(path + ": no shape in header");
  sp += 10;
  auto ep = header.find(')', sp);
  std::string dims = header.substr(sp, ep - sp);
  NpyArray arr;
  size_t pos = 0;
  while (pos < dims.size()) {
    while (pos < dims.size() && !isdigit(dims[pos])) ++pos;
    if (pos >= dims.size()) break;
    size_t end;
    arr.shape.push_back(std::stoll(dims.substr(pos), &end));
    pos += end;
  }
  arr.data.resize(arr.size());
  f.read(reinterpret_cast<char*>(arr.data.data()),
         arr.size() * sizeof(float));
  if (!f) throw std::runtime_error(path + ": truncated data");
  return arr;
}

// uint8 variant ('|u1') — frames for the native app loop
// (visionpilot_app.cpp) are numpy-saved uint8 stacks.
struct NpyArrayU8 {
  std::vector<int64_t> shape;
  std::vector<uint8_t> data;
  int64_t size() const {
    int64_t n = 1;
    for (auto d : shape) n *= d;
    return n;
  }
};

inline NpyArrayU8 read_npy_u8(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) throw std::runtime_error("cannot open " + path);
  char magic[6];
  f.read(magic, 6);
  if (std::memcmp(magic, "\x93NUMPY", 6) != 0)
    throw std::runtime_error(path + ": not a .npy file");
  uint8_t ver[2];
  f.read(reinterpret_cast<char*>(ver), 2);
  uint32_t hlen = 0;
  if (ver[0] == 1) {
    uint16_t h16;
    f.read(reinterpret_cast<char*>(&h16), 2);
    hlen = h16;
  } else {
    f.read(reinterpret_cast<char*>(&hlen), 4);
  }
  std::string header(hlen, '\0');
  f.read(header.data(), hlen);
  if (header.find("'|u1'") == std::string::npos)
    throw std::runtime_error(path + ": dtype is not '|u1'");
  if (header.find("'fortran_order': False") == std::string::npos)
    throw std::runtime_error(path + ": fortran order unsupported");
  auto sp = header.find("'shape': (");
  if (sp == std::string::npos)
    throw std::runtime_error(path + ": no shape in header");
  sp += 10;
  auto ep = header.find(')', sp);
  std::string dims = header.substr(sp, ep - sp);
  NpyArrayU8 arr;
  size_t pos = 0;
  while (pos < dims.size()) {
    while (pos < dims.size() && !isdigit(dims[pos])) ++pos;
    if (pos >= dims.size()) break;
    size_t end;
    arr.shape.push_back(std::stoll(dims.substr(pos), &end));
    pos += end;
  }
  arr.data.resize(arr.size());
  f.read(reinterpret_cast<char*>(arr.data.data()),
         static_cast<std::streamsize>(arr.size()));
  if (!f) throw std::runtime_error(path + ": truncated data");
  return arr;
}

inline void write_npy_f32(const std::string& path, const NpyArray& arr) {
  std::string shape = "(";
  for (size_t i = 0; i < arr.shape.size(); ++i)
    shape += std::to_string(arr.shape[i]) + ",";
  shape += ")";
  std::string dict = "{'descr': '<f4', 'fortran_order': False, 'shape': " +
                     shape + ", }";
  size_t total = 10 + dict.size() + 1;  // magic+ver+len + dict + \n
  size_t pad = (64 - total % 64) % 64;
  dict += std::string(pad, ' ') + "\n";
  uint16_t hlen = static_cast<uint16_t>(dict.size());
  std::ofstream f(path, std::ios::binary);
  f.write("\x93NUMPY\x01\x00", 8);
  f.write(reinterpret_cast<char*>(&hlen), 2);
  f.write(dict.data(), dict.size());
  f.write(reinterpret_cast<const char*>(arr.data.data()),
          arr.data.size() * sizeof(float));
}

}  // namespace avp
