// Longitudinal stack implementation — see avp/longitudinal.hpp for the
// mapping to the reference sources and the Python parity contract
// (tests/test_native_longitudinal.py drives this against
// perception/tracking.py + control/*.py step for step).

#include "avp/longitudinal.hpp"

#include <algorithm>
#include <cmath>
#include <limits>

namespace avp::lon {

// ---- Kalman ---------------------------------------------------------------

void Kalman1D::reset() {
    x[0] = x[1] = 0.0;
    P[0][0] = 1000.0; P[0][1] = 0.0;
    P[1][0] = 0.0;    P[1][1] = 1000.0;
    initialized = false;
}

void Kalman1D::initialize(double position) {
    x[0] = position;
    x[1] = 0.0;
    P[0][0] = 10.0; P[0][1] = 0.0;
    P[1][0] = 0.0;  P[1][1] = 100.0;
    initialized = true;
}

void Kalman1D::predict(double dt) {
    if (!initialized) return;
    // F = [[1, dt], [0, 1]];  x = F x;  P = F P F^T + diag(q_pos, q_vel)
    x[0] += dt * x[1];
    const double p00 = P[0][0] + dt * (P[1][0] + P[0][1]) + dt * dt * P[1][1];
    const double p01 = P[0][1] + dt * P[1][1];
    const double p10 = P[1][0] + dt * P[1][1];
    P[0][0] = p00 + q_pos;
    P[0][1] = p01;
    P[1][0] = p10;
    P[1][1] += q_vel;
}

void Kalman1D::update(double z) {
    if (!initialized) {
        initialize(z);
        return;
    }
    const double innovation = z - x[0];
    const double S = P[0][0] + r;
    const double k0 = P[0][0] / S, k1 = P[1][0] / S;
    x[0] += k0 * innovation;
    x[1] += k1 * innovation;
    // P = (I - K H) P with H = [1, 0]
    const double p00 = (1.0 - k0) * P[0][0];
    const double p01 = (1.0 - k0) * P[0][1];
    const double p10 = P[1][0] - k1 * P[0][0];
    const double p11 = P[1][1] - k1 * P[0][1];
    P[0][0] = p00; P[0][1] = p01; P[1][0] = p10; P[1][1] = p11;
}

// ---- scoring (tracking_utils.cpp:80-86 / tracking.py:95-116) ---------------

static double iou_xywh(const Bbox& a, const Bbox& b) {
    const int x1 = std::max(a.x, b.x);
    const int y1 = std::max(a.y, b.y);
    const int x2 = std::min(a.x + a.w, b.x + b.w);
    const int y2 = std::min(a.y + a.h, b.y + b.h);
    const double inter = (double)std::max(0, x2 - x1) *
                         (double)std::max(0, y2 - y1);
    const double uni = (double)a.w * a.h + (double)b.w * b.h - inter;
    return uni > 0.0 ? inter / uni : 0.0;
}

double matching_score(const Bbox& det, const Bbox& track, int img_w,
                      int img_h) {
    const double i = iou_xywh(det, track);
    const double cax = det.x + det.w / 2.0, cay = det.y + det.h / 2.0;
    const double cbx = track.x + track.w / 2.0, cby = track.y + track.h / 2.0;
    const double dist = std::hypot(cax - cbx, cay - cby);
    const double max_dist = std::hypot((double)img_w, (double)img_h);
    const double norm_dist = 1.0 - std::min(dist / max_dist, 1.0);
    const double area_a = (double)det.w * det.h;
    const double area_b = (double)track.w * track.h;
    const double size_sim =
        (area_a > 0.0 && area_b > 0.0)
            ? std::min(area_a, area_b) / std::max(area_a, area_b)
            : 0.0;
    return 0.5 * i + 0.3 * norm_dist + 0.2 * size_sim;
}

// ---- crop histogram matching (native ORB stand-in) --------------------------

CropHist crop_histogram(const uint8_t* frame, int frame_w, int frame_h,
                        const Bbox& box) {
    CropHist out;
    if (frame == nullptr) return out;
    const int x0 = std::max(0, box.x), y0 = std::max(0, box.y);
    const int x1 = std::min(frame_w, box.x + box.w);
    const int y1 = std::min(frame_h, box.y + box.h);
    if (x1 <= x0 || y1 <= y0) return out;
    out.h.assign(16 * 16 * 16, 0.0f);
    for (int y = y0; y < y1; ++y) {
        const uint8_t* row = frame + ((size_t)y * frame_w + x0) * 3;
        for (int x = x0; x < x1; ++x, row += 3)
            out.h[(row[0] >> 4) * 256 + (row[1] >> 4) * 16 + (row[2] >> 4)] +=
                1.0f;
    }
    const float n = (float)((x1 - x0) * (int64_t)(y1 - y0));
    for (float& v : out.h) v /= n;
    return out;
}

bool same_object(const CropHist& a, const CropHist& b, double threshold) {
    if (!a.valid() || !b.valid()) return false;
    // normalized correlation of mean-centered histograms (cv::compareHist
    // HISTCMP_CORREL semantics)
    double ma = 0.0, mb = 0.0;
    const size_t n = a.h.size();
    for (size_t i = 0; i < n; ++i) { ma += a.h[i]; mb += b.h[i]; }
    ma /= (double)n; mb /= (double)n;
    double num = 0.0, da = 0.0, db = 0.0;
    for (size_t i = 0; i < n; ++i) {
        const double ia = a.h[i] - ma, ib = b.h[i] - mb;
        num += ia * ib; da += ia * ia; db += ib * ib;
    }
    const double den = std::sqrt(da * db);
    return den > 0.0 && num / den >= threshold;
}

// ---- ObjectFinder -----------------------------------------------------------

ObjectFinder::ObjectFinder(const double* homography, int image_width,
                           int image_height)
    : img_w_(image_width), img_h_(image_height) {
    for (int i = 0; i < 9; ++i) H_[i] = homography[i];
}

void ObjectFinder::image_to_world(double px, double py, double* wx,
                                  double* wy) const {
    const double X = H_[0] * px + H_[1] * py + H_[2];
    const double Y = H_[3] * px + H_[4] * py + H_[5];
    const double W = H_[6] * px + H_[7] * py + H_[8];
    *wx = X / W;
    *wy = Y / W;
}

std::vector<Track> ObjectFinder::update(const std::vector<Detection>& dets,
                                        double now) {
    // greedy association in detection order (tracking.py:213-234)
    struct Assoc { int di, ti; };
    std::vector<Assoc> assoc;
    std::vector<bool> track_matched(tracks_.size(), false);
    for (int di = 0; di < (int)dets.size(); ++di) {
        const int cls = dets[di].class_id;
        if (cls != 1 && cls != 2) continue;  // TRACKABLE_CLASSES
        const Bbox db{(int)dets[di].x1, (int)dets[di].y1,
                      (int)(dets[di].x2 - dets[di].x1),
                      (int)(dets[di].y2 - dets[di].y1)};
        int best = -1;
        double best_score = 0.0;
        for (int ti = 0; ti < (int)tracks_.size(); ++ti) {
            if (track_matched[ti] || tracks_[ti].class_id != cls) continue;
            const double s = matching_score(db, tracks_[ti].bbox, img_w_,
                                            img_h_);
            if (s > kMatchingThreshold && s > best_score) {
                best = ti;
                best_score = s;
            }
        }
        if (best >= 0) track_matched[best] = true;
        assoc.push_back({di, best});
    }

    // Python-parity snapshot semantics: Python's prev_tracks aliases the
    // OLD list's objects, which update() mutates IN PLACE — so a matched
    // track's snapshot carries THIS frame's kalman, and an unmatched
    // track's carries the incremented frames_unmatched. Value-semantics
    // C++ must write those mutations back into the snapshot explicitly,
    // or the CIPO model-confusion transfer (get_cipo) restores a
    // one-frame-stale filter.
    std::vector<Track> prev_snapshot = tracks_;
    std::vector<Track> new_tracks;
    for (const Assoc& a : assoc) {
        const Detection& det = dets[a.di];
        const Bbox bbox{(int)det.x1, (int)det.y1, (int)(det.x2 - det.x1),
                        (int)(det.y2 - det.y1)};
        double wx, wy;
        image_to_world(bbox.x + bbox.w / 2.0, (double)(bbox.y + bbox.h),
                       &wx, &wy);
        const double measured = std::hypot(wx, wy);

        Track obj;
        if (a.ti >= 0) {
            obj = tracks_[a.ti];
            obj.frames_tracked += 1;
            obj.frames_unmatched = 0;
            obj.kalman.predict(now - obj.last_update_time);
            obj.kalman.update(measured);
            obj.distance_m = obj.kalman.position();
            obj.velocity_ms = obj.kalman.velocity();
        } else {
            obj.track_id = next_track_id_++;
            obj.class_id = det.class_id;
            obj.kalman.initialize(measured);
            obj.distance_m = measured;
            obj.velocity_ms = 0.0;
        }
        obj.bbox = bbox;
        obj.confidence = det.conf;
        obj.last_update_time = now;
        if (a.ti >= 0) prev_snapshot[a.ti] = obj;
        new_tracks.push_back(obj);
    }
    for (int ti = 0; ti < (int)tracks_.size(); ++ti) {
        if (track_matched[ti]) continue;
        Track tr = tracks_[ti];
        tr.frames_unmatched += 1;
        prev_snapshot[ti] = tr;
        if (tr.frames_unmatched <= kMaxFramesUnmatched)
            new_tracks.push_back(tr);
    }
    prev_tracks_ = std::move(prev_snapshot);
    tracks_ = std::move(new_tracks);
    return tracks_;
}

CipoInfo ObjectFinder::get_cipo(const uint8_t* frame, bool* cut_in,
                                bool* reset) {
    CipoInfo cipo;
    *cut_in = false;
    *reset = false;

    auto closest = [&](int level) {
        int best = -1;
        double best_d = std::numeric_limits<double>::infinity();
        for (int i = 0; i < (int)tracks_.size(); ++i) {
            const Track& t = tracks_[i];
            if (t.class_id == level && t.distance_m > 0.0 &&
                t.distance_m < best_d) {
                best = i;
                best_d = t.distance_m;
            }
        }
        return best;
    };
    const int i1 = closest(1), i2 = closest(2);
    if (i1 < 0 && i2 < 0) return cipo;
    int main_idx;
    if (i1 < 0) main_idx = i2;
    else if (i2 < 0) main_idx = i1;
    else main_idx = tracks_[i1].distance_m <= tracks_[i2].distance_m ? i1 : i2;

    Track& main = tracks_[main_idx];
    cipo.exists = true;
    cipo.track_id = main.track_id;
    cipo.class_id = main.class_id;
    cipo.distance_m = main.distance_m;

    Snapshot snap{main.track_id,
                  crop_histogram(frame, img_w_, img_h_, main.bbox)};
    cipo_history_.push_back(snap);
    if ((int)cipo_history_.size() > kCipoHistory)
        cipo_history_.erase(cipo_history_.begin());

    const bool changed =
        cipo_history_.size() >= 2 &&
        cipo_history_[cipo_history_.size() - 2].track_id != snap.track_id;
    if (!changed) {
        cipo.velocity_ms = main.velocity_ms;
        return cipo;
    }
    const Snapshot& prev = cipo_history_[cipo_history_.size() - 2];
    if (!prev.hist.valid() || !snap.hist.valid()) {
        // no crops (frame=None parity): carry velocity, no cut-in call
        cipo.velocity_ms = main.velocity_ms;
        return cipo;
    }
    if (same_object(prev.hist, snap.hist)) {
        // model confusion (level 1 <-> 2): transfer the Kalman state
        for (const Track& p : prev_tracks_) {
            if (p.track_id == prev.track_id) {
                main.kalman = p.kalman;
                break;
            }
        }
    } else {
        *cut_in = true;
        *reset = true;
        main.kalman.reset();
        main.kalman.initialize(main.distance_m);
        main.velocity_ms = 0.0;
    }
    cipo.velocity_ms = main.velocity_ms;
    return cipo;
}

TrackingOutput ObjectFinder::update_and_get_cipo(
    const std::vector<Detection>& dets, double now, const uint8_t* frame) {
    update(dets, now);
    TrackingOutput out;
    out.cipo = get_cipo(frame, &out.cut_in_detected, &out.kalman_reset);
    out.num_tracks = (int)tracks_.size();
    return out;
}

// ---- SpeedPlanner ------------------------------------------------------------

double SpeedPlanner::calc_safe_rss_distance() const {
    const double cipo_abs = ego_speed_ + rel_speed_;
    const double v_react = ego_speed_ + c_.response_time * c_.a_max_accel;
    const double d =
        c_.response_time * ego_speed_ +
        0.5 * c_.a_max_accel * c_.response_time * c_.response_time +
        v_react * v_react / (2.0 * c_.a_min_brake) -
        cipo_abs * cipo_abs / (2.0 * c_.a_max_brake);
    return std::max(d, 5.0);  // floor at one car length
}

double SpeedPlanner::calc_ideal_driving_speed() {
    double accel = 0.0;
    fcw_ = false;
    aeb_ = false;
    if (cipo_present_) {
        const double d_safe = calc_safe_rss_distance();
        const double d = distance_;
        if (d >= d_safe * 1.1) {
            accel = 1.0;
        } else if (d >= d_safe * 0.5 && d <= d_safe * 0.9) {
            accel = -1.0;
        } else if (d >= d_safe * 0.25 && d < d_safe * 0.5) {
            accel = -2.5;
            fcw_ = true;
        } else if (d < d_safe * 0.25) {
            accel = -5.0;
            fcw_ = true;
            aeb_ = true;
        }
        // 0.9..1.1 band: hold speed
    } else {
        accel = 1.0;
    }
    const double set_speed = ego_speed_ + accel * 0.5;  // 0.5 s look-ahead
    return std::max(0.0, std::min(set_speed, c_.speed_limit));
}

// ---- PIController --------------------------------------------------------------

double PIController::compute_effort(double current_speed,
                                    double target_speed) {
    const double error = target_speed - current_speed;
    integral_ += error;
    const double effort =
        kp_ * error + ki_ * integral_ + kd_ * (error - prev_error_);
    prev_error_ = error;
    return effort;
}

}  // namespace avp::lon
