#include "avp/can_reader.hpp"

#include <fcntl.h>
#include <net/if.h>
#include <sys/ioctl.h>
#include <sys/socket.h>
#include <unistd.h>

#include <linux/can.h>
#include <linux/can/raw.h>

#include <algorithm>
#include <cmath>
#include <limits>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <sstream>

namespace avp::can {

CanReader::CanReader(const std::string& iface_or_asc) {
    if (iface_or_asc.size() > 4 &&
        iface_or_asc.substr(iface_or_asc.size() - 4) == ".asc") {
        load_asc(iface_or_asc);
        return;
    }
    fd_ = socket(PF_CAN, SOCK_RAW | SOCK_NONBLOCK, CAN_RAW);
    if (fd_ < 0) {
        std::fprintf(stderr, "[can] cannot open CAN_RAW socket — "
                             "continuing without CAN\n");
        return;
    }
    struct ifreq ifr{};
    std::strncpy(ifr.ifr_name, iface_or_asc.c_str(), IFNAMSIZ - 1);
    if (ioctl(fd_, SIOCGIFINDEX, &ifr) < 0) {
        std::fprintf(stderr, "[can] no interface %s — continuing without "
                             "CAN\n", iface_or_asc.c_str());
        close(fd_);
        fd_ = -1;
        return;
    }
    struct sockaddr_can addr{};
    addr.can_family = AF_CAN;
    addr.can_ifindex = ifr.ifr_ifindex;
    if (bind(fd_, (struct sockaddr*)&addr, sizeof(addr)) < 0) {
        std::fprintf(stderr, "[can] bind(%s) failed — continuing without "
                             "CAN\n", iface_or_asc.c_str());
        close(fd_);
        fd_ = -1;
    }
}

CanReader::~CanReader() {
    if (fd_ >= 0) close(fd_);
}

void CanReader::apply(uint32_t id, const uint8_t* data, size_t len) {
    // Python-driver parity (drivers/can_interface.py:_apply): a short
    // speed frame decodes to NaN and INVALIDATES the state (stale speed
    // must not keep driving RSS/PID), and validity is re-derived from
    // the speed on EVERY applied frame.
    if (id == kSpeedFrameId) {
        state_.speed_ms =
            len >= 2 ? (double)(uint16_t)(data[0] | (data[1] << 8)) * 0.01
                     : std::numeric_limits<double>::quiet_NaN();
    } else if (id == kSteeringFrameId) {
        state_.steering_angle_deg =
            len >= 2 ? (double)(int16_t)(data[0] | (data[1] << 8)) * 0.1
                     : std::numeric_limits<double>::quiet_NaN();
    } else {
        return;
    }
    state_.valid = !std::isnan(state_.speed_ms);
}

void CanReader::load_asc(const std::string& path) {
    // Vector .asc line: '<time> <chan> <id>[x] Rx d <len> <b0> <b1> ...'
    std::ifstream f(path);
    if (!f) {
        std::fprintf(stderr, "[can] cannot open %s\n", path.c_str());
        return;
    }
    std::string line;
    while (std::getline(f, line)) {
        std::istringstream ss(line);
        double t;
        int chan;
        std::string id_s, dir, dtag;
        int len;
        if (!(ss >> t >> chan >> id_s >> dir >> dtag >> len)) continue;
        if (dir != "Rx" || dtag != "d") continue;
        if (!id_s.empty() && (id_s.back() == 'x' || id_s.back() == 'X'))
            id_s.pop_back();
        uint32_t id = (uint32_t)std::strtoul(id_s.c_str(), nullptr, 16);
        ReplayFrame fr{};
        fr.t = t;
        fr.id = id;
        fr.len = (uint8_t)std::min(len, 8);
        bool ok = true;
        for (int i = 0; i < fr.len; ++i) {
            std::string b;
            if (!(ss >> b)) { ok = false; break; }
            fr.data[i] = (uint8_t)std::strtoul(b.c_str(), nullptr, 16);
        }
        if (ok) replay_.push_back(fr);
    }
    std::sort(replay_.begin(), replay_.end(),
              [](const ReplayFrame& a, const ReplayFrame& b) {
                  return a.t < b.t;
              });
}

const VehicleState& CanReader::update(double now_s) {
    if (fd_ >= 0) {
        struct can_frame frame;
        while (read(fd_, &frame, sizeof(frame)) == (ssize_t)sizeof(frame))
            apply(frame.can_id & CAN_EFF_MASK, frame.data, frame.can_dlc);
        return state_;
    }
    if (!replay_.empty()) {
        if (replay_t0_ < 0.0) replay_t0_ = now_s - replay_.front().t;
        const double t_rel = now_s - replay_t0_;
        while (replay_pos_ < replay_.size() &&
               replay_[replay_pos_].t <= t_rel) {
            const ReplayFrame& fr = replay_[replay_pos_++];
            apply(fr.id, fr.data, fr.len);
        }
    }
    return state_;
}

}  // namespace avp::can
