# moospark server image — ClickHouse-compatible HTTP (8123) + native (9000)
# wire protocols on a Spark engine.  Mirrors the reference's container
# contract (reference Dockerfile:1, .github/workflows/test.yml:20-26):
# boot the image, wait for /ping, point clients at 8123/9000.
#
#   docker build -t moospark .
#   docker run -p 8123:8123 -p 9000:9000 moospark
#   curl -G --data-urlencode "query=SELECT version(), now()" http://localhost:8123
#
# PySpark needs a JVM, so the base is python + a headless JRE 17 rather
# than the reference's python-only python:3.11-slim (its engine is a
# bundled native .so; ours is the Spark JVM).
FROM python:3.11-slim

RUN apt-get update \
  && apt-get install -y --no-install-recommends openjdk-17-jre-headless \
  && rm -rf /var/lib/apt/lists/*
ENV JAVA_HOME=/usr/lib/jvm/java-17-openjdk-amd64

RUN pip install --no-cache-dir pyspark==4.1.2 pyarrow pandas numpy

WORKDIR /app
ADD cowsdb_spark ./cowsdb_spark

# Spark local mode inside the container: all visible cores, moderate
# shuffle width for interactive queries.  Override via env at run time.
ENV SPARK_GRAFT_CPUS="*"
ENV PORT=8123
ENV NATIVE_PORT=9000
# file() reads / INTO OUTFILE writes confine to this root (CH
# user_files_path analog); mount data here to load local files
RUN mkdir -p /var/lib/moospark/user_files
ENV MOOSPARK_USER_FILES_DIR=/var/lib/moospark/user_files

EXPOSE 8123
EXPOSE 9000
CMD ["python3", "-m", "cowsdb_spark"]
