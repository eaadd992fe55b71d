// Host-side longitudinal stack: multi-object tracking with CIPO
// selection, RSS speed planning and the longitudinal PI controller.
//
// Native port of the reference's in-process longitudinal path
// (VisionPilot/production_release/main.cpp:662-785: ObjectFinder ->
// SpeedPlanner -> PIController feeding the published state struct), with
// the same constants and state-machine semantics as this repo's Python
// perception/tracking.py + control/speed_planner.py + control/
// pi_controller.py (themselves formula-parity rebuilds of
// object_finder.cpp / speed_planning.cpp / pi_controller.cpp).
//
// The detector (AutoSpeed: letterbox -> net -> decode -> fixed-shape NMS)
// runs on the TPU as an exported StableHLO program; this code consumes
// its packed (max_det, 7) [x1,y1,x2,y2,score,class,valid] table. Object
// counts are tiny (<10 tracks) and the logic is a branch-heavy scalar
// state machine — host C++ is the right tool, not the MXU.
//
// One deliberate deviation: the reference's cut-in discriminator is ORB
// feature matching (feature_matching_utils.cpp, OpenCV). The native
// binary carries no OpenCV; same_object() here is BGR histogram
// correlation over the CIPO crops, which answers the same question
// ("is the new CIPO track the same physical vehicle?") with the same
// decision contract (>= threshold -> transfer Kalman, else cut-in ->
// reset + flag). With no frame available the tracker matches the Python
// frame=None behavior exactly: CIPO change carries velocity, no cut-in.

#pragma once

#include <cstdint>
#include <vector>

namespace avp::lon {

// ---- constants (perception/tracking.py:37-41) -----------------------------
constexpr double kMatchingThreshold = 0.55;
constexpr int kMaxFramesUnmatched = 3;
constexpr int kCipoHistory = 30;
constexpr double kHistMatchThreshold = 0.5;  // same_object correlation bar

// 1D constant-velocity Kalman (kalman_filter.cpp semantics; float64).
struct Kalman1D {
    double q_pos = 1.0, q_vel = 1.0, r = 1.0;
    double x[2] = {0.0, 0.0};
    double P[2][2] = {{1000.0, 0.0}, {0.0, 1000.0}};
    bool initialized = false;

    void reset();
    void initialize(double position);
    void predict(double dt);
    void update(double z);
    double position() const { return x[0]; }
    double velocity() const { return x[1]; }
};

struct Detection {           // one row of the device NMS table
    double x1, y1, x2, y2;   // pixel corners in the original frame
    double conf;
    int class_id;
};

struct Bbox { int x, y, w, h; };

struct Track {
    int track_id;
    int class_id;
    Bbox bbox;
    double confidence;
    double distance_m = 0.0;
    double velocity_ms = 0.0;
    int frames_tracked = 1;
    int frames_unmatched = 0;
    double last_update_time = 0.0;
    Kalman1D kalman;
};

struct CipoInfo {
    bool exists = false;
    int track_id = -1;
    int class_id = -1;
    double distance_m = 0.0;
    double velocity_ms = 0.0;
};

struct TrackingOutput {
    CipoInfo cipo;
    bool cut_in_detected = false;
    bool kalman_reset = false;
    int num_tracks = 0;
};

// 16^3-bin BGR histogram of a crop; same_object = normalized correlation.
struct CropHist {
    std::vector<float> h;  // 4096 bins, L1-normalized; empty = no crop
    bool valid() const { return !h.empty(); }
};

CropHist crop_histogram(const uint8_t* frame, int frame_w, int frame_h,
                        const Bbox& box);
bool same_object(const CropHist& a, const CropHist& b,
                 double threshold = kHistMatchThreshold);

double matching_score(const Bbox& det, const Bbox& track, int img_w,
                      int img_h);

// Tracker + CIPO state machine (object_finder.cpp / tracking.py:192-357).
class ObjectFinder {
 public:
    // homography: row-major 3x3 image->world on the bbox bottom-center.
    ObjectFinder(const double* homography, int image_width,
                 int image_height);

    // One frame: associate + Kalman + lifecycle, then CIPO selection.
    // `now` is the frame timestamp in seconds (drives Kalman dt).
    // `frame` (HxWx3 u8 BGR) may be null: crop matching is skipped and a
    // CIPO track change carries velocity without cut-in (Python
    // frame=None parity).
    TrackingOutput update_and_get_cipo(const std::vector<Detection>& dets,
                                       double now,
                                       const uint8_t* frame = nullptr);

    const std::vector<Track>& tracks() const { return tracks_; }

 private:
    struct Snapshot {
        int track_id;
        CropHist hist;
    };

    void image_to_world(double px, double py, double* wx, double* wy) const;
    std::vector<Track> update(const std::vector<Detection>& dets,
                              double now);
    CipoInfo get_cipo(const uint8_t* frame, bool* cut_in, bool* reset);

    double H_[9];
    int img_w_, img_h_;
    int next_track_id_ = 0;
    std::vector<Track> tracks_;
    std::vector<Track> prev_tracks_;
    std::vector<Snapshot> cipo_history_;
};

// ---- RSS speed planner (speed_planning.cpp:55-115) ------------------------
struct RSSConstants {
    double a_max_brake = 4.5;
    double a_max_accel = 2.0;
    double a_min_brake = 1.0;
    double response_time = 0.1;
    double speed_limit = 31.0;
};

class SpeedPlanner {
 public:
    explicit SpeedPlanner(RSSConstants c = RSSConstants{}) : c_(c) {}

    void set_ego_speed(double v) { ego_speed_ = v; }
    void set_is_cipo_present(bool p) { cipo_present_ = p; }
    void set_cipo_state(double relative_speed, double distance) {
        rel_speed_ = relative_speed;
        distance_ = distance;
    }

    double calc_safe_rss_distance() const;
    double calc_ideal_driving_speed();  // also updates fcw/aeb
    bool fcw() const { return fcw_; }
    bool aeb() const { return aeb_; }

 private:
    RSSConstants c_;
    double ego_speed_ = 0.0, rel_speed_ = 0.0, distance_ = 0.0;
    bool cipo_present_ = false;
    bool fcw_ = false, aeb_ = false;
};

// ---- PI controller (pi_controller.cpp:23-38 + cut-in reset main.cpp:730) --
class PIController {
 public:
    PIController(double kp, double ki, double kd)
        : kp_(kp), ki_(ki), kd_(kd) {}

    double compute_effort(double current_speed, double target_speed);
    void reset() { integral_ = 0.0; prev_error_ = 0.0; }

 private:
    double kp_, ki_, kd_;
    double integral_ = 0.0;
    double prev_error_ = 0.0;
};

}  // namespace avp::lon
