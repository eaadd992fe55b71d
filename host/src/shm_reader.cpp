// Standalone consumer of the /visionpilot_state segment: attaches
// read-only and prints seqlock-consistent snapshots (or one with --once).
// Same role as the reference's tools/shm_reader.cpp smoke tester.

#include "avp/shared_state.hpp"

#include <unistd.h>

#include <cstdio>
#include <cstring>

int main(int argc, char** argv) {
    bool once = false;
    const char* name = "/visionpilot_state";
    for (int i = 1; i < argc; ++i) {
        if (std::strcmp(argv[i], "--once") == 0) once = true;
        else name = argv[i];
    }

    avp::host::SharedState shm(name, /*owner=*/false);
    if (!shm.ok()) {
        std::fprintf(stderr, "cannot attach to %s (is the pipeline running?)\n",
                     name);
        return 1;
    }

    avp::host::VisionPilotState s{};
    do {
        shm.read(&s);
        std::printf(
            "frame=%llu steer=%.2fdeg (raw %.2f, autosteer %.2f) "
            "cte=%.3fm yaw=%.4frad path=%d | cipo=%d id=%d d=%.1fm "
            "v=%.2fm/s cutin=%d | v_set=%.2f effort=%.2f fcw=%d aeb=%d | "
            "ego=%.2fm/s can=%d\n",
            (unsigned long long)s.frame_number, s.steering_pid_deg,
            s.steering_pid_raw_deg, s.steering_autosteer_deg, s.cte_m,
            s.yaw_error_rad, (int)s.path_valid, (int)s.cipo_exists,
            s.cipo_track_id, s.cipo_distance_m, s.cipo_velocity_ms,
            (int)s.cut_in_detected, s.ideal_speed_ms, s.control_effort_ms2,
            (int)s.fcw_active, (int)s.aeb_active, s.ego_speed_ms,
            (int)s.can_valid);
        if (!once) usleep(100000);
    } while (!once);
    return 0;
}
